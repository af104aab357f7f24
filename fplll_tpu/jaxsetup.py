"""Central JAX import + configuration.

Lattice reduction needs f64 tree arithmetic (the reference's enumf is
double, nr/nr.h:41), so x64 is enabled globally before any kernel is
traced. Device modules import jax/jnp from here.
"""

from __future__ import annotations

import os

import jax

jax.config.update("jax_enable_x64", True)
# One-hot matmul *selections* permeate the enumeration kernels (ohf @ mu,
# ohf @ rdiag, ...). At JAX's default matmul precision the TPU MXU truncates
# f32 operands to bfloat16 passes (~8 mantissa bits) — far outside both the
# f32 kernel's 1e-5 bound slack and the dd32 kernel's ~48-bit certified
# guarantee, so a proved search could silently prune the true solution.
# Force full-precision matmuls globally; every dot in this library is either
# tiny (one-hot selects) or correctness-critical (center partial sums).
jax.config.update("jax_default_matmul_precision", "highest")

# explicit platform override (e.g. FPLLL_TPU_PLATFORM=cpu for the virtual
# multi-device test mesh); takes precedence over ambient JAX_PLATFORMS
_platform = os.environ.get("FPLLL_TPU_PLATFORM")
if _platform:
    jax.config.update("jax_platforms", _platform)
# persistent compile cache: enumeration kernels are traced once per
# (levels-bucket, mode) and reused across processes
_cache_dir = os.environ.get("FPLLL_TPU_JAX_CACHE",
                            os.path.expanduser("~/.cache/fplll_tpu_jax"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402

__all__ = ["jax", "jnp"]
