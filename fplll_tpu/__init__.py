"""fplll_tpu — a TPU-native lattice reduction framework.

Re-designed from scratch with the capability set of fplll
(/root/reference): LLL / HLLL / BKZ / BKZ-2.0 / slide & self-dual
reduction, SVP/CVP by pruned enumeration, and the pruning-coefficient
optimizer — with JAX/XLA/Pallas device kernels for the hot paths and a
host-side exact-integer orchestration layer.
"""

from .defs import *  # noqa: F401,F403
from .ops.intmat import (IntMat, format_matrix, format_vector, parse_matrix,  # noqa: F401
                         parse_vector, read_matrix)
from .ops import gen  # noqa: F401
from .nr.rng import RandGen, RandGenInt  # noqa: F401
from .nr.fctx import (F64Ctx, MPCtx, get_ctx, float_ctx_from_name,  # noqa: F401
                      gso_min_prec, l2_min_prec, hlll_min_prec)
from .core.gso import MatGSO, MatGSOGram, adjust_radius_to_gh_bound  # noqa: F401
from .core.householder import MatHouseholder  # noqa: F401
from .algs.lll import LLLReduction, is_lll_reduced  # noqa: F401
from .algs.hlll import HLLLReduction, is_hlll_reduced  # noqa: F401
from .algs.wrapper import (Wrapper, lll_reduction, hlll_reduction,  # noqa: F401
                           zeros_first, zeros_last)
from .algs.bkz import (BKZReduction, BKZAutoAbort, bkz_reduction,  # noqa: F401
                       hkz_reduction)
from .algs.bkz_param import (BKZParam, PruningParams, Strategy,  # noqa: F401
                             load_strategies_json)
from .algs.svpcvp import (closest_vector, shortest_vector,  # noqa: F401
                          shortest_vector_pruning)
from .pruner.pruner import Pruner, prune, svp_probability  # noqa: F401
from .threads import get_threads, set_threads  # noqa: F401

__version__ = "1.0.0.dev0"
