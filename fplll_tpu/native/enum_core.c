/* Sequential Kannan–Fincke–Pohst enumeration core.
 *
 * Native implementation of the host oracle's DFS loop (the role of the
 * reference's enumerate_base.cpp:152-247 iterative loop): plain-double
 * tree arithmetic, zig-zag sibling stepping with SVP symmetry breaking,
 * per-level pruning bounds, best-1 bound shrinking or count-only mode,
 * optional CVP targets and dual partial-sum updates, node budget.
 *
 * Built with the baked-in toolchain at first use (see native/__init__.py)
 * and called through ctypes; the pure-Python oracle remains the fallback
 * and the semantic reference.
 */

#include <math.h>
#include <stdint.h>
#include <string.h>

#define MAXD 1024

typedef struct {
  double maxdist;        /* in/out: updated bound (best-1 mode) */
  double best_dist;      /* out: best solution distance */
  double sol_count;      /* out: number of bottom hits (count mode) */
  int64_t nodes_budget;  /* in: 0 = unlimited */
  int64_t visited;       /* out: loop iterations */
  int found;             /* out: 1 if best_x valid */
} enum_result;

/* returns 0 on success, -1 on bad input */
int enum_run(int d,
             const double *mut,        /* d*d row-major, mut[i*d+j]=mu(j,i) */
             const double *rdiag,      /* d */
             const double *pruning,    /* d or NULL */
             const double *target,     /* d (center partsums) or NULL */
             int is_svp,               /* break symmetry + skip zero vector */
             int dual,                 /* dual partial-sum updates */
             int count_mode,           /* don't shrink the bound */
             double *best_x,           /* out: d coords */
             double *nodes_per_level,  /* out: d counters (accumulated) */
             enum_result *res) {
  static double cps[MAXD + 1][MAXD + 1]; /* center partial sums cache */
  double x[MAXD], dx[MAXD], ddx[MAXD], center[MAXD], alpha[MAXD];
  double partdist[MAXD + 1], bounds[MAXD];
  int cpb[MAXD + 1];
  double maxdist = res->maxdist;
  int k, i, j;

  if (d < 1 || d > MAXD) return -1;

  for (i = 0; i < d; i++) {
    double c = target ? target[i] : 0.0;
    cps[i][d] = c;
    cpb[i + 1] = d - 1;
    x[i] = 0.0; dx[i] = 0.0; ddx[i] = 0.0; center[i] = 0.0; alpha[i] = 0.0;
    partdist[i] = 0.0;
  }
  cpb[0] = 0;
  partdist[d] = 0.0;

  /* initial descent (prepare_enumeration, enumerate.cpp:160-213) */
  {
    double newdist = 0.0;
    int svp = is_svp;
    for (k = d - 1; k >= 0 && newdist <= maxdist; --k) {
      double newcenter = target ? target[k] : 0.0;
      for (j = k + 1; j < d; ++j)
        newcenter -= (dual ? alpha[j] : x[j]) * mut[k * d + j];
      x[k] = round(newcenter);
      center[k] = newcenter;
      partdist[k] = newdist;
      dx[k] = ddx[k] = (newcenter >= x[k]) ? 1.0 : -1.0;
      alpha[k] = x[k] - newcenter;
      newdist += alpha[k] * alpha[k] * rdiag[k];
    }
    if (svp) { x[0] = 1.0; }
    k = k + 1;
  }

  for (i = 0; i < d; i++)
    bounds[i] = (pruning ? pruning[i] : 1.0) * maxdist;

  /* rebuild lazy center-partsum cache for the main loop */
  for (i = 0; i < d; i++) {
    cps[i][d] = target ? target[i] : 0.0;
    cpb[i + 1] = d - 1;
  }
  cpb[0] = 0;
  partdist[d] = 0.0;
  for (i = k + 1; i < d; i++) nodes_per_level[i] -= 1.0;
  k = d - 1;

  res->found = 0;
  res->best_dist = INFINITY;
  res->sol_count = 0.0;
  res->visited = 0;

  while (1) {
    double alphak, newdist;
    if (res->nodes_budget && res->visited >= res->nodes_budget) break;
    res->visited++;
    alphak = x[k] - center[k];
    newdist = partdist[k] + alphak * alphak * rdiag[k];
    if (newdist <= bounds[k]) {
      nodes_per_level[k] += 1.0;
      alpha[k] = alphak;
      k -= 1;
      if (k < 0) {
        /* bottom: solution */
        if (newdist > 0.0 || !is_svp) {
          res->sol_count += 1.0;
          if (newdist < res->best_dist) {
            res->best_dist = newdist;
            memcpy(best_x, x, (size_t)d * sizeof(double));
            res->found = 1;
            if (!count_mode) {
              maxdist = newdist;
              for (i = 0; i < d; i++)
                bounds[i] = (pruning ? pruning[i] : 1.0) * maxdist;
            }
          }
        }
        /* next_pos_up from k=-1 */
        k = 0;
        goto sibling;
      }
      /* descend: refresh lazy partial sums */
      if (dual) {
        for (j = cpb[k + 1]; j > k; --j)
          cps[k][j] = cps[k][j + 1] - alpha[j] * mut[k * d + j];
      } else {
        for (j = cpb[k + 1]; j > k; --j)
          cps[k][j] = cps[k][j + 1] - x[j] * mut[k * d + j];
      }
      if (cpb[k + 1] > cpb[k]) cpb[k] = cpb[k + 1];
      cpb[k + 1] = k + 1;
      center[k] = cps[k][k + 1];
      partdist[k] = newdist;
      x[k] = round(center[k]);
      dx[k] = ddx[k] = (center[k] >= x[k]) ? 1.0 : -1.0;
      continue;
    }
    /* bound fail: ascend */
    k += 1;
    if (k >= d) break;
  sibling:
    if (partdist[k] != 0.0) {
      x[k] += dx[k];
      ddx[k] = -ddx[k];
      dx[k] = ddx[k] - dx[k];
    } else {
      if (k >= d) break;
      if (is_svp) {
        x[k] += 1.0;
      } else {
        x[k] += dx[k];
        ddx[k] = -ddx[k];
        dx[k] = ddx[k] - dx[k];
      }
    }
  }

  res->maxdist = maxdist;
  return 0;
}
