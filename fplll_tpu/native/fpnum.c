/* fpnum: compiled host scalar tower for the precision ladder.
 *
 * One Python extension type `fpnum` with three kinds:
 *   - dpe: 53-bit mantissa + unbounded int64 exponent (the role of the
 *     reference's vendored dpe_t, /root/reference/fplll/nr/dpe.h:22);
 *   - dd : double-double, ~106-bit mantissa, double exponent range (the
 *     role of libqd's dd_real, /root/reference/fplll/nr/nr_FP_dd.inl);
 *   - qd : quad-double, ~212-bit mantissa (nr_FP_qd.inl).
 *
 * The arithmetic uses error-free transforms (TwoSum/TwoProd via FMA) and
 * expansion distillation; it is a fresh implementation, not a port of
 * libqd (same published algorithms: Dekker/Knuth EFTs, Hida-Li-Bailey
 * expansions, Ogita-Rump-Oishi distillation).
 *
 * These types plug into the GSO/Householder/LLL engines through the
 * float-context protocol (fplll_tpu/nr/fctx.py) as the compiled
 * replacements for the mpmath soft-float at 53/106/212 bits.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <math.h>
#include <stdint.h>
#include <string.h>

/* ------------------------------------------------------------------ */
/* error-free transforms                                              */
/* ------------------------------------------------------------------ */
static inline double two_sum(double a, double b, double *err)
{
    double s = a + b;
    double bb = s - a;
    *err = (a - (s - bb)) + (b - bb);
    return s;
}

static inline double quick_two_sum(double a, double b, double *err)
{
    double s = a + b;
    *err = b - (s - a);
    return s;
}

static inline double two_prod(double a, double b, double *err)
{
    double p = a * b;
    *err = fma(a, b, -p);
    return p;
}

/* ------------------------------------------------------------------ */
/* dd core                                                            */
/* ------------------------------------------------------------------ */
typedef struct { double hi, lo; } dd_t;

static inline dd_t dd_mk(double hi, double lo)
{
    dd_t r; r.hi = quick_two_sum(hi, lo, &r.lo); return r;
}

static inline dd_t dd_from_d(double d) { dd_t r = {d, 0.0}; return r; }

static dd_t dd_add(dd_t a, dd_t b)
{
    double s1, s2, t1, t2;
    s1 = two_sum(a.hi, b.hi, &s2);
    t1 = two_sum(a.lo, b.lo, &t2);
    s2 += t1;
    s1 = quick_two_sum(s1, s2, &s2);
    s2 += t2;
    s1 = quick_two_sum(s1, s2, &s2);
    dd_t r = {s1, s2}; return r;
}

static inline dd_t dd_neg(dd_t a) { dd_t r = {-a.hi, -a.lo}; return r; }
static inline dd_t dd_sub(dd_t a, dd_t b) { return dd_add(a, dd_neg(b)); }

static dd_t dd_mul(dd_t a, dd_t b)
{
    double p1, p2;
    p1 = two_prod(a.hi, b.hi, &p2);
    p2 += a.hi * b.lo + a.lo * b.hi;
    p1 = quick_two_sum(p1, p2, &p2);
    dd_t r = {p1, p2}; return r;
}

static inline dd_t dd_mul_d(dd_t a, double b)
{
    double p1, p2;
    p1 = two_prod(a.hi, b, &p2);
    p2 += a.lo * b;
    p1 = quick_two_sum(p1, p2, &p2);
    dd_t r = {p1, p2}; return r;
}

static dd_t dd_div(dd_t a, dd_t b)
{
    double q1, q2, q3;
    dd_t r;
    q1 = a.hi / b.hi;
    if (!isfinite(q1)) { dd_t z = {q1, 0.0}; return z; }
    r = dd_sub(a, dd_mul_d(b, q1));
    q2 = r.hi / b.hi;
    r = dd_sub(r, dd_mul_d(b, q2));
    q3 = r.hi / b.hi;
    q1 = quick_two_sum(q1, q2, &q2);
    return dd_add(dd_mk(q1, q2), dd_from_d(q3));
}

static dd_t dd_sqrt(dd_t a)
{
    if (a.hi == 0.0 && a.lo == 0.0) return dd_from_d(0.0);
    if (a.hi < 0.0) return dd_from_d(NAN);
    double x0 = sqrt(a.hi);
    /* one Newton step in dd: s = x0 + (a - x0^2) / (2 x0) */
    double e;
    double p = two_prod(x0, x0, &e);
    dd_t x0sq = {p, e};
    dd_t diff = dd_sub(a, x0sq);
    dd_t corr = dd_mul_d(diff, 0.5 / x0);
    return dd_add(dd_from_d(x0), corr);
}

static dd_t dd_nint(dd_t a)
{
    double hi = rint(a.hi), lo = 0.0;
    if (hi == a.hi) {
        lo = rint(a.lo);
        double e;
        hi = quick_two_sum(hi, lo, &e);
        dd_t r = {hi, e}; return r;
    }
    if (fabs(hi - a.hi) == 0.5) {
        /* a.hi is a half-integer; lo decides the direction */
        if (hi > a.hi && a.lo < 0.0) hi -= 1.0;
        else if (hi < a.hi && a.lo > 0.0) hi += 1.0;
    }
    dd_t r = {hi, 0.0}; return r;
}

static inline dd_t dd_ldexp(dd_t a, long e)
{
    dd_t r = {ldexp(a.hi, (int)e), ldexp(a.lo, (int)e)}; return r;
}

static inline int dd_cmp(dd_t a, dd_t b)
{
    if (a.hi < b.hi) return -1;
    if (a.hi > b.hi) return 1;
    if (a.lo < b.lo) return -1;
    if (a.lo > b.lo) return 1;
    return 0;
}

/* ------------------------------------------------------------------ */
/* qd core: expansions of 4 doubles, distillation-based               */
/* ------------------------------------------------------------------ */
typedef struct { double x[4]; } qd_t;

static inline qd_t qd_from_d(double d)
{
    qd_t r = {{d, 0.0, 0.0, 0.0}}; return r;
}

/* renormalize 5 doubles into a 4-term nonoverlapping expansion */
static void renorm5(double c0, double c1, double c2, double c3, double c4,
                    qd_t *out)
{
    double s0, s1, s2 = 0.0, s3 = 0.0;
    if (!isfinite(c0)) {
        out->x[0] = c0; out->x[1] = out->x[2] = out->x[3] = 0.0;
        return;
    }
    s0 = quick_two_sum(c3, c4, &c4);
    s0 = quick_two_sum(c2, s0, &c3);
    s0 = quick_two_sum(c1, s0, &c2);
    c0 = quick_two_sum(c0, s0, &c1);
    s0 = c0; s1 = c1;
    s0 = quick_two_sum(c0, c1, &s1);
    if (s1 != 0.0) {
        s1 = quick_two_sum(s1, c2, &s2);
        if (s2 != 0.0) {
            s2 = quick_two_sum(s2, c3, &s3);
            if (s3 != 0.0) s3 += c4; else s2 += c4;
        } else {
            s1 = quick_two_sum(s1, c3, &s2);
            if (s2 != 0.0) s2 = quick_two_sum(s2, c4, &s3);
            else s1 = quick_two_sum(s1, c4, &s2);
        }
    } else {
        s0 = quick_two_sum(s0, c2, &s1);
        if (s1 != 0.0) {
            s1 = quick_two_sum(s1, c3, &s2);
            if (s2 != 0.0) s2 = quick_two_sum(s2, c4, &s3);
            else s1 = quick_two_sum(s1, c4, &s2);
        } else {
            s0 = quick_two_sum(s0, c3, &s1);
            if (s1 != 0.0) s1 = quick_two_sum(s1, c4, &s2);
            else s0 = quick_two_sum(s0, c4, &s1);
        }
    }
    out->x[0] = s0; out->x[1] = s1; out->x[2] = s2; out->x[3] = s3;
}

/* distill n (<=16) doubles into a qd: K=4 VecSum sweeps (SumK-style,
 * Ogita-Rump-Oishi) then renorm. Input should be roughly ordered by
 * decreasing magnitude for best accuracy. */
static qd_t qd_distill(double *t, int n)
{
    int k, i;
    for (k = 0; k < 4 && k < n - 1; k++)
        for (i = n - 2; i >= k; i--)
            t[i] = two_sum(t[i], t[i + 1], &t[i + 1]);
    {
        double tail = 0.0;
        for (i = 4; i < n; i++) tail += t[i];
        qd_t r;
        renorm5(n > 0 ? t[0] : 0.0, n > 1 ? t[1] : 0.0,
                n > 2 ? t[2] : 0.0, n > 3 ? t[3] : 0.0, tail, &r);
        return r;
    }
}

static qd_t qd_add(qd_t a, qd_t b)
{
    /* merge the two (decreasing) expansions by magnitude, then distill */
    double t[8];
    int i = 0, j = 0, k = 0;
    while (i < 4 && j < 4)
        t[k++] = (fabs(a.x[i]) >= fabs(b.x[j])) ? a.x[i++] : b.x[j++];
    while (i < 4) t[k++] = a.x[i++];
    while (j < 4) t[k++] = b.x[j++];
    return qd_distill(t, 8);
}

static inline qd_t qd_neg(qd_t a)
{
    qd_t r = {{-a.x[0], -a.x[1], -a.x[2], -a.x[3]}}; return r;
}

static inline qd_t qd_sub(qd_t a, qd_t b) { return qd_add(a, qd_neg(b)); }

static qd_t qd_mul(qd_t a, qd_t b)
{
    /* partial products by order with EFT errors; order-3 errors and
     * order-4 products are below 2^-212 relative and are dropped. */
    double t[16];
    int n = 0;
    double e;
    t[n++] = two_prod(a.x[0], b.x[0], &e); t[n++] = e;          /* order 0 */
    t[n++] = two_prod(a.x[0], b.x[1], &e); t[n++] = e;          /* order 1 */
    t[n++] = two_prod(a.x[1], b.x[0], &e); t[n++] = e;
    t[n++] = two_prod(a.x[0], b.x[2], &e); t[n++] = e;          /* order 2 */
    t[n++] = two_prod(a.x[1], b.x[1], &e); t[n++] = e;
    t[n++] = two_prod(a.x[2], b.x[0], &e); t[n++] = e;
    t[n++] = a.x[0] * b.x[3];                                   /* order 3 */
    t[n++] = a.x[1] * b.x[2];
    t[n++] = a.x[2] * b.x[1];
    t[n++] = a.x[3] * b.x[0];
    return qd_distill(t, n);
}

static qd_t qd_mul_d(qd_t a, double b)
{
    double t[8];
    int n = 0;
    double e;
    t[n++] = two_prod(a.x[0], b, &e); t[n++] = e;
    t[n++] = two_prod(a.x[1], b, &e); t[n++] = e;
    t[n++] = two_prod(a.x[2], b, &e); t[n++] = e;
    t[n++] = a.x[3] * b;
    return qd_distill(t, n);
}

static qd_t qd_div(qd_t a, qd_t b)
{
    double q0, q1, q2, q3, q4;
    qd_t r;
    q0 = a.x[0] / b.x[0];
    if (!isfinite(q0)) return qd_from_d(q0);
    r = qd_sub(a, qd_mul_d(b, q0));
    q1 = r.x[0] / b.x[0];
    r = qd_sub(r, qd_mul_d(b, q1));
    q2 = r.x[0] / b.x[0];
    r = qd_sub(r, qd_mul_d(b, q2));
    q3 = r.x[0] / b.x[0];
    r = qd_sub(r, qd_mul_d(b, q3));
    q4 = r.x[0] / b.x[0];
    {
        qd_t out;
        renorm5(q0, q1, q2, q3, q4, &out);
        return out;
    }
}

static qd_t qd_sqrt(qd_t a)
{
    if (a.x[0] == 0.0 && a.x[1] == 0.0) return qd_from_d(0.0);
    if (a.x[0] < 0.0) return qd_from_d(NAN);
    /* Newton on s = 0.5*(s + a/s), two steps from the double seed:
       53 -> 106 -> 212 bits. */
    qd_t s = qd_from_d(sqrt(a.x[0]));
    int it;
    for (it = 0; it < 2; it++)
        s = qd_mul_d(qd_add(s, qd_div(a, s)), 0.5);
    return s;
}

static qd_t qd_nint(qd_t a)
{
    double r0 = rint(a.x[0]), r1 = 0.0, r2 = 0.0, r3 = 0.0;
    if (r0 == a.x[0]) {
        r1 = rint(a.x[1]);
        if (r1 == a.x[1]) {
            r2 = rint(a.x[2]);
            if (r2 == a.x[2]) {
                r3 = rint(a.x[3]);
            } else if (fabs(r2 - a.x[2]) == 0.5) {
                if (r2 > a.x[2] && a.x[3] < 0.0) r2 -= 1.0;
                else if (r2 < a.x[2] && a.x[3] > 0.0) r2 += 1.0;
            }
        } else if (fabs(r1 - a.x[1]) == 0.5) {
            if (r1 > a.x[1] && a.x[2] < 0.0) r1 -= 1.0;
            else if (r1 < a.x[1] && a.x[2] > 0.0) r1 += 1.0;
        }
    } else if (fabs(r0 - a.x[0]) == 0.5) {
        if (r0 > a.x[0] && a.x[1] < 0.0) r0 -= 1.0;
        else if (r0 < a.x[0] && a.x[1] > 0.0) r0 += 1.0;
    }
    {
        qd_t out;
        renorm5(r0, r1, r2, r3, 0.0, &out);
        return out;
    }
}

static inline qd_t qd_ldexp(qd_t a, long e)
{
    qd_t r = {{ldexp(a.x[0], (int)e), ldexp(a.x[1], (int)e),
               ldexp(a.x[2], (int)e), ldexp(a.x[3], (int)e)}};
    return r;
}

static inline int qd_cmp(qd_t a, qd_t b)
{
    int i;
    for (i = 0; i < 4; i++) {
        if (a.x[i] < b.x[i]) return -1;
        if (a.x[i] > b.x[i]) return 1;
    }
    return 0;
}

/* ------------------------------------------------------------------ */
/* dpe core: double mantissa in [0.5, 1) + int64 exponent             */
/* ------------------------------------------------------------------ */
typedef struct { double m; int64_t e; } dpe_t;

static inline dpe_t dpe_norm(double m, int64_t e)
{
    dpe_t r;
    int k;
    if (m == 0.0 || !isfinite(m)) { r.m = m; r.e = 0; return r; }
    r.m = frexp(m, &k);
    r.e = e + k;
    return r;
}

static inline dpe_t dpe_from_d(double d) { return dpe_norm(d, 0); }

static dpe_t dpe_add(dpe_t a, dpe_t b)
{
    if (a.m == 0.0) return b;
    if (b.m == 0.0) return a;
    if (!isfinite(a.m) || !isfinite(b.m))
        return dpe_norm(a.m + b.m, 0);
    if (a.e - b.e > 55) return a;
    if (b.e - a.e > 55) return b;
    if (a.e >= b.e)
        return dpe_norm(a.m + ldexp(b.m, (int)(b.e - a.e)), a.e);
    return dpe_norm(b.m + ldexp(a.m, (int)(a.e - b.e)), b.e);
}

static inline dpe_t dpe_neg(dpe_t a) { dpe_t r = {-a.m, a.e}; return r; }
static inline dpe_t dpe_sub(dpe_t a, dpe_t b) { return dpe_add(a, dpe_neg(b)); }

static inline dpe_t dpe_mul(dpe_t a, dpe_t b)
{
    return dpe_norm(a.m * b.m, a.e + b.e);
}

static inline dpe_t dpe_div(dpe_t a, dpe_t b)
{
    if (b.m == 0.0) { dpe_t r = {a.m / b.m, 0}; return r; }
    return dpe_norm(a.m / b.m, a.e - b.e);
}

static dpe_t dpe_sqrt(dpe_t a)
{
    double m = a.m;
    int64_t e = a.e;
    if (m < 0.0) { dpe_t r = {NAN, 0}; return r; }
    if (m == 0.0) { dpe_t r = {0.0, 0}; return r; }
    if (e & 1) { m *= 2.0; e -= 1; }
    return dpe_norm(sqrt(m), e / 2);
}

static dpe_t dpe_nint(dpe_t a)
{
    if (!isfinite(a.m) || a.m == 0.0) return a;
    if (a.e > 53) return a;          /* already an integer */
    if (a.e < -1) { dpe_t r = {0.0, 0}; return r; }
    return dpe_from_d(rint(ldexp(a.m, (int)a.e)));
}

static inline dpe_t dpe_ldexp(dpe_t a, long e)
{
    dpe_t r = a;
    if (r.m != 0.0 && isfinite(r.m)) r.e += e;
    return r;
}

static int dpe_cmp(dpe_t a, dpe_t b)
{
    /* finite normalized values: compare by sign, then exponent, then m */
    if (!isfinite(a.m) || !isfinite(b.m)) {
        double x = a.m, y = b.m;
        if (x < y) return -1;
        if (x > y) return 1;
        return 0;
    }
    int sa = (a.m > 0.0) - (a.m < 0.0);
    int sb = (b.m > 0.0) - (b.m < 0.0);
    if (sa != sb) return sa < sb ? -1 : 1;
    if (sa == 0) return 0;
    if (a.e != b.e) {
        int c = a.e < b.e ? -1 : 1;
        return sa > 0 ? c : -c;
    }
    if (a.m < b.m) return -1;
    if (a.m > b.m) return 1;
    return 0;
}

static inline double dpe_to_d(dpe_t a)
{
    if (a.m == 0.0 || !isfinite(a.m)) return a.m;
    if (a.e > 1100) return a.m > 0 ? INFINITY : -INFINITY;
    if (a.e < -1100) return a.m > 0 ? 0.0 : -0.0;
    return ldexp(a.m, (int)a.e);
}

/* ------------------------------------------------------------------ */
/* the Python object: tagged union                                     */
/* ------------------------------------------------------------------ */
enum { KIND_DPE = 0, KIND_DD = 1, KIND_QD = 2 };

typedef struct {
    PyObject_HEAD
    int kind;
    union {
        dpe_t dpe;
        dd_t dd;
        qd_t qd;
    } v;
} FpNum;

static PyTypeObject FpNumType;   /* forward */

static FpNum *fp_alloc(int kind)
{
    FpNum *r = PyObject_New(FpNum, &FpNumType);
    if (r) { r->kind = kind; memset(&r->v, 0, sizeof(r->v)); }
    return r;
}

static FpNum *fp_from_dpe(dpe_t x)
{
    FpNum *r = fp_alloc(KIND_DPE);
    if (r) r->v.dpe = x;
    return r;
}

static FpNum *fp_from_dd(dd_t x)
{
    FpNum *r = fp_alloc(KIND_DD);
    if (r) r->v.dd = x;
    return r;
}

static FpNum *fp_from_qd(qd_t x)
{
    FpNum *r = fp_alloc(KIND_QD);
    if (r) r->v.qd = x;
    return r;
}

static FpNum *fp_make(int kind, dpe_t dp, dd_t dd, qd_t qd)
{
    switch (kind) {
    case KIND_DPE: return fp_from_dpe(dp);
    case KIND_DD:  return fp_from_dd(dd);
    default:       return fp_from_qd(qd);
    }
}

/* sign of a PyLong that is known to overflow a C long */
static int pylong_overflow_sign(PyObject *o)
{
    int ovf = 0;
    (void)PyLong_AsLongAndOverflow(o, &ovf);
    return ovf;   /* +1 or -1; a value that fits never reaches here */
}

/* exact conversion of a PyLong into <=nc leading double components */
static int pylong_components(PyObject *o, double *c, int nc)
{
    PyObject *cur = o;
    int i;
    Py_INCREF(cur);
    for (i = 0; i < nc; i++) c[i] = 0.0;
    for (i = 0; i < nc; i++) {
        double d = PyLong_AsDouble(cur);
        if (d == -1.0 && PyErr_Occurred()) {
            PyErr_Clear();
            /* overflow: sign decides the infinity */
            int neg = pylong_overflow_sign(cur) < 0;
            c[0] = neg ? -INFINITY : INFINITY;
            for (i = 1; i < nc; i++) c[i] = 0.0;
            Py_DECREF(cur);
            return 0;
        }
        c[i] = d;
        if (d == 0.0) break;
        {
            PyObject *di = PyLong_FromDouble(d);
            PyObject *nxt;
            if (!di) { Py_DECREF(cur); return -1; }
            nxt = PyNumber_Subtract(cur, di);
            Py_DECREF(di);
            Py_DECREF(cur);
            if (!nxt) return -1;
            cur = nxt;
        }
    }
    Py_DECREF(cur);
    return 0;
}

/* coerce a Python object to the value of the given kind.
 * returns 0 ok, 1 not convertible (-> NotImplemented), -1 error. */
static int coerce(PyObject *o, int kind, dpe_t *dp, dd_t *dd, qd_t *qd)
{
    if (Py_TYPE(o) == &FpNumType) {
        FpNum *f = (FpNum *)o;
        if (f->kind != kind) return 1;  /* no silent cross-kind mixing */
        switch (kind) {
        case KIND_DPE: *dp = f->v.dpe; break;
        case KIND_DD:  *dd = f->v.dd; break;
        default:       *qd = f->v.qd; break;
        }
        return 0;
    }
    if (PyFloat_Check(o)) {
        double d = PyFloat_AS_DOUBLE(o);
        switch (kind) {
        case KIND_DPE: *dp = dpe_from_d(d); break;
        case KIND_DD:  *dd = dd_from_d(d); break;
        default:       *qd = qd_from_d(d); break;
        }
        return 0;
    }
    if (PyLong_Check(o)) {
        double c[4];
        switch (kind) {
        case KIND_DPE: {
            /* exact only when it fits a double; larger ints should come
             * through ctx.from_int (mantissa+exponent split) */
            double d = PyLong_AsDouble(o);
            if (d == -1.0 && PyErr_Occurred()) {
                PyErr_Clear();
                d = pylong_overflow_sign(o) < 0 ? -INFINITY : INFINITY;
            }
            *dp = dpe_from_d(d);
            return 0;
        }
        case KIND_DD:
            if (pylong_components(o, c, 2) < 0) return -1;
            *dd = dd_mk(c[0], c[1]);
            return 0;
        default:
            if (pylong_components(o, c, 4) < 0) return -1;
            {
                qd_t r;
                renorm5(c[0], c[1], c[2], c[3], 0.0, &r);
                *qd = r;
            }
            return 0;
        }
    }
    return 1;
}

/* ---------------- number protocol ---------------- */
#define BINOP(name, dpe_op, dd_op, qd_op)                                   \
static PyObject *fp_##name(PyObject *a, PyObject *b)                        \
{                                                                           \
    int kind = (Py_TYPE(a) == &FpNumType) ? ((FpNum *)a)->kind              \
                                          : ((FpNum *)b)->kind;             \
    dpe_t pa, pb; dd_t da, db; qd_t qa, qb;                                 \
    int ra = coerce(a, kind, &pa, &da, &qa);                                \
    int rb = ra ? ra : coerce(b, kind, &pb, &db, &qb);                      \
    if (ra < 0 || rb < 0) return NULL;                                      \
    if (ra > 0 || rb > 0) Py_RETURN_NOTIMPLEMENTED;                         \
    switch (kind) {                                                         \
    case KIND_DPE: return (PyObject *)fp_from_dpe(dpe_op(pa, pb));          \
    case KIND_DD:  return (PyObject *)fp_from_dd(dd_op(da, db));            \
    default:       return (PyObject *)fp_from_qd(qd_op(qa, qb));            \
    }                                                                       \
}

BINOP(nb_add, dpe_add, dd_add, qd_add)
BINOP(nb_sub, dpe_sub, dd_sub, qd_sub)
BINOP(nb_mul, dpe_mul, dd_mul, qd_mul)
BINOP(nb_div, dpe_div, dd_div, qd_div)

static PyObject *fp_nb_neg(PyObject *a)
{
    FpNum *f = (FpNum *)a;
    switch (f->kind) {
    case KIND_DPE: return (PyObject *)fp_from_dpe(dpe_neg(f->v.dpe));
    case KIND_DD:  return (PyObject *)fp_from_dd(dd_neg(f->v.dd));
    default:       return (PyObject *)fp_from_qd(qd_neg(f->v.qd));
    }
}

static PyObject *fp_nb_pos(PyObject *a) { Py_INCREF(a); return a; }

static int fp_sign(FpNum *f)
{
    switch (f->kind) {
    case KIND_DPE: return (f->v.dpe.m > 0.0) - (f->v.dpe.m < 0.0);
    case KIND_DD:  return (f->v.dd.hi > 0.0) - (f->v.dd.hi < 0.0);
    default:       return (f->v.qd.x[0] > 0.0) - (f->v.qd.x[0] < 0.0);
    }
}

static PyObject *fp_nb_abs(PyObject *a)
{
    if (fp_sign((FpNum *)a) < 0) return fp_nb_neg(a);
    Py_INCREF(a); return a;
}

static double fp_to_double(FpNum *f)
{
    switch (f->kind) {
    case KIND_DPE: return dpe_to_d(f->v.dpe);
    case KIND_DD:  return f->v.dd.hi + f->v.dd.lo;
    default:       return f->v.qd.x[0] + f->v.qd.x[1];
    }
}

static PyObject *fp_nb_float(PyObject *a)
{
    return PyFloat_FromDouble(fp_to_double((FpNum *)a));
}

static int fp_nb_bool(PyObject *a)
{
    FpNum *f = (FpNum *)a;
    switch (f->kind) {
    case KIND_DPE: return f->v.dpe.m != 0.0;
    case KIND_DD:  return f->v.dd.hi != 0.0 || f->v.dd.lo != 0.0;
    default:       return f->v.qd.x[0] != 0.0;
    }
}

static int fp_isnan(FpNum *f)
{
    switch (f->kind) {
    case KIND_DPE: return isnan(f->v.dpe.m);
    case KIND_DD:  return isnan(f->v.dd.hi);
    default:       return isnan(f->v.qd.x[0]);
    }
}

static PyObject *fp_richcompare(PyObject *a, PyObject *b, int op)
{
    int kind = (Py_TYPE(a) == &FpNumType) ? ((FpNum *)a)->kind
                                          : ((FpNum *)b)->kind;
    dpe_t pa, pb; dd_t da, db; qd_t qa, qb;
    int ra = coerce(a, kind, &pa, &da, &qa);
    int rb = ra ? ra : coerce(b, kind, &pb, &db, &qb);
    int c, nan;
    if (ra < 0 || rb < 0) return NULL;
    if (ra > 0 || rb > 0) Py_RETURN_NOTIMPLEMENTED;
    switch (kind) {
    case KIND_DPE: c = dpe_cmp(pa, pb); nan = isnan(pa.m) || isnan(pb.m); break;
    case KIND_DD:  c = dd_cmp(da, db); nan = isnan(da.hi) || isnan(db.hi); break;
    default:       c = qd_cmp(qa, qb); nan = isnan(qa.x[0]) || isnan(qb.x[0]); break;
    }
    if (nan) {
        if (op == Py_NE) Py_RETURN_TRUE;
        Py_RETURN_FALSE;
    }
    switch (op) {
    case Py_LT: return PyBool_FromLong(c < 0);
    case Py_LE: return PyBool_FromLong(c <= 0);
    case Py_EQ: return PyBool_FromLong(c == 0);
    case Py_NE: return PyBool_FromLong(c != 0);
    case Py_GT: return PyBool_FromLong(c > 0);
    default:    return PyBool_FromLong(c >= 0);
    }
}

/* ---------------- methods ---------------- */
static PyObject *fp_sqrt(PyObject *self, PyObject *noargs)
{
    FpNum *f = (FpNum *)self;
    (void)noargs;
    switch (f->kind) {
    case KIND_DPE: return (PyObject *)fp_from_dpe(dpe_sqrt(f->v.dpe));
    case KIND_DD:  return (PyObject *)fp_from_dd(dd_sqrt(f->v.dd));
    default:       return (PyObject *)fp_from_qd(qd_sqrt(f->v.qd));
    }
}

static PyObject *fp_nint(PyObject *self, PyObject *noargs)
{
    FpNum *f = (FpNum *)self;
    (void)noargs;
    switch (f->kind) {
    case KIND_DPE: return (PyObject *)fp_from_dpe(dpe_nint(f->v.dpe));
    case KIND_DD:  return (PyObject *)fp_from_dd(dd_nint(f->v.dd));
    default:       return (PyObject *)fp_from_qd(qd_nint(f->v.qd));
    }
}

static PyObject *fp_ldexp_m(PyObject *self, PyObject *arg)
{
    FpNum *f = (FpNum *)self;
    long e = PyLong_AsLong(arg);
    if (e == -1 && PyErr_Occurred()) return NULL;
    switch (f->kind) {
    case KIND_DPE: return (PyObject *)fp_from_dpe(dpe_ldexp(f->v.dpe, e));
    case KIND_DD:  return (PyObject *)fp_from_dd(dd_ldexp(f->v.dd, e));
    default:       return (PyObject *)fp_from_qd(qd_ldexp(f->v.qd, e));
    }
}

/* frexp-style exponent: 2^(e-1) <= |x| < 2^e (FP_NR::exponent) */
static PyObject *fp_exponent(PyObject *self, PyObject *noargs)
{
    FpNum *f = (FpNum *)self;
    (void)noargs;
    switch (f->kind) {
    case KIND_DPE:
        if (f->v.dpe.m == 0.0 || !isfinite(f->v.dpe.m))
            return PyLong_FromLong(0);
        return PyLong_FromLongLong((long long)f->v.dpe.e);
    case KIND_DD: {
        double h = f->v.dd.hi;
        int e;
        if (h == 0.0 || !isfinite(h)) return PyLong_FromLong(0);
        frexp(h, &e);
        return PyLong_FromLong(e);
    }
    default: {
        double h = f->v.qd.x[0];
        int e;
        if (h == 0.0 || !isfinite(h)) return PyLong_FromLong(0);
        frexp(h, &e);
        return PyLong_FromLong(e);
    }
    }
}

static PyObject *fp_isfinite(PyObject *self, PyObject *noargs)
{
    FpNum *f = (FpNum *)self;
    (void)noargs;
    switch (f->kind) {
    case KIND_DPE: return PyBool_FromLong(isfinite(f->v.dpe.m));
    case KIND_DD:  return PyBool_FromLong(isfinite(f->v.dd.hi));
    default:       return PyBool_FromLong(isfinite(f->v.qd.x[0]));
    }
}

/* (components, exponent_offset): exact doubles summing to the value
 * (times 2^offset for dpe). Used by the Python side for exact
 * value*2^e -> int extraction. */
static PyObject *fp_parts(PyObject *self, PyObject *noargs)
{
    FpNum *f = (FpNum *)self;
    (void)noargs;
    switch (f->kind) {
    case KIND_DPE:
        return Py_BuildValue("(d)L", f->v.dpe.m, (long long)f->v.dpe.e);
    case KIND_DD:
        return Py_BuildValue("(dd)L", f->v.dd.hi, f->v.dd.lo, 0LL);
    default:
        return Py_BuildValue("(dddd)L", f->v.qd.x[0], f->v.qd.x[1],
                             f->v.qd.x[2], f->v.qd.x[3], 0LL);
    }
}

static PyObject *fp_repr(PyObject *self)
{
    FpNum *f = (FpNum *)self;
    static const char *names[] = {"dpe", "dd", "qd"};
    if (f->kind == KIND_DPE)
        return PyUnicode_FromFormat("%s(%R*2^%lld)", names[f->kind],
                                    PyFloat_FromDouble(f->v.dpe.m),
                                    (long long)f->v.dpe.e);
    return PyUnicode_FromFormat("%s(%R)", names[f->kind],
                                PyFloat_FromDouble(fp_to_double(f)));
}

static PyMethodDef fp_methods[] = {
    {"sqrt", fp_sqrt, METH_NOARGS, "square root"},
    {"nint", fp_nint, METH_NOARGS, "round to nearest integer, ties even"},
    {"ldexp", fp_ldexp_m, METH_O, "multiply by 2^e"},
    {"exponent", fp_exponent, METH_NOARGS, "frexp exponent"},
    {"is_finite", fp_isfinite, METH_NOARGS, "finiteness"},
    {"parts", fp_parts, METH_NOARGS, "(components, exp2) exact decomposition"},
    {NULL, NULL, 0, NULL},
};

static PyNumberMethods fp_as_number = {
    .nb_add = fp_nb_add,
    .nb_subtract = fp_nb_sub,
    .nb_multiply = fp_nb_mul,
    .nb_true_divide = fp_nb_div,
    .nb_negative = fp_nb_neg,
    .nb_positive = fp_nb_pos,
    .nb_absolute = fp_nb_abs,
    .nb_bool = fp_nb_bool,
    .nb_float = fp_nb_float,
};

static PyTypeObject FpNumType = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "fpnum.fpnum",
    .tp_basicsize = sizeof(FpNum),
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_repr = fp_repr,
    .tp_as_number = &fp_as_number,
    .tp_richcompare = fp_richcompare,
    .tp_methods = fp_methods,
    .tp_doc = "compiled dpe/dd/qd scalar",
};

/* ---------------- module-level constructors & kernels -------------- */
static PyObject *make_kind(PyObject *arg, int kind)
{
    dpe_t dp = {0.0, 0}; dd_t dd = {0.0, 0.0}; qd_t qd = {{0, 0, 0, 0}};
    int r = coerce(arg, kind, &dp, &dd, &qd);
    if (r < 0) return NULL;
    if (r > 0) {
        /* cross-kind conversion goes through double (explicit constructor
         * only; arithmetic never mixes kinds silently) */
        if (Py_TYPE(arg) == &FpNumType) {
            double d = fp_to_double((FpNum *)arg);
            switch (kind) {
            case KIND_DPE: dp = dpe_from_d(d); break;
            case KIND_DD:  dd = dd_from_d(d); break;
            default:       qd = qd_from_d(d); break;
            }
            return (PyObject *)fp_make(kind, dp, dd, qd);
        }
        PyErr_SetString(PyExc_TypeError, "expected float, int or fpnum");
        return NULL;
    }
    return (PyObject *)fp_make(kind, dp, dd, qd);
}

static PyObject *mod_dpe(PyObject *m, PyObject *a) { (void)m; return make_kind(a, KIND_DPE); }
static PyObject *mod_dd(PyObject *m, PyObject *a) { (void)m; return make_kind(a, KIND_DD); }
static PyObject *mod_qd(PyObject *m, PyObject *a) { (void)m; return make_kind(a, KIND_QD); }

/* dpe from (mantissa float, exponent int) without double-range limits */
static PyObject *mod_dpe_me(PyObject *m, PyObject *args)
{
    double mant;
    long long e;
    (void)m;
    if (!PyArg_ParseTuple(args, "dL", &mant, &e)) return NULL;
    return (PyObject *)fp_from_dpe(dpe_norm(mant, e));
}

/* dd/qd from exact double components */
static PyObject *mod_dd_pair(PyObject *m, PyObject *args)
{
    double hi, lo = 0.0;
    (void)m;
    if (!PyArg_ParseTuple(args, "d|d", &hi, &lo)) return NULL;
    return (PyObject *)fp_from_dd(dd_mk(hi, lo));
}

static PyObject *mod_qd_comp(PyObject *m, PyObject *args)
{
    double c0, c1 = 0.0, c2 = 0.0, c3 = 0.0;
    qd_t r;
    (void)m;
    if (!PyArg_ParseTuple(args, "d|ddd", &c0, &c1, &c2, &c3)) return NULL;
    renorm5(c0, c1, c2, c3, 0.0, &r);
    return (PyObject *)fp_from_qd(r);
}

/* sequential dot product over two sequences of fpnum/float/int */
static PyObject *mod_dot(PyObject *m, PyObject *args)
{
    PyObject *ua, *va, *uf = NULL, *vf = NULL, *out = NULL;
    Py_ssize_t n, i;
    int kind = -1;
    dpe_t accp = {0.0, 0}; dd_t accd = {0.0, 0.0}; qd_t accq = {{0, 0, 0, 0}};
    (void)m;
    if (!PyArg_ParseTuple(args, "OO", &ua, &va)) return NULL;
    uf = PySequence_Fast(ua, "dot: first arg not a sequence");
    if (!uf) goto fail;
    vf = PySequence_Fast(va, "dot: second arg not a sequence");
    if (!vf) goto fail;
    n = PySequence_Fast_GET_SIZE(uf);
    if (PySequence_Fast_GET_SIZE(vf) < n) n = PySequence_Fast_GET_SIZE(vf);
    for (i = 0; i < n; i++) {
        PyObject *x = PySequence_Fast_GET_ITEM(uf, i);
        PyObject *y = PySequence_Fast_GET_ITEM(vf, i);
        dpe_t px, py; dd_t dx, dy; qd_t qx, qy;
        if (kind < 0) {
            if (Py_TYPE(x) == &FpNumType) kind = ((FpNum *)x)->kind;
            else if (Py_TYPE(y) == &FpNumType) kind = ((FpNum *)y)->kind;
            else kind = KIND_DD;
        }
        if (coerce(x, kind, &px, &dx, &qx) != 0 ||
            coerce(y, kind, &py, &dy, &qy) != 0) {
            PyErr_SetString(PyExc_TypeError, "dot: unsupported element");
            goto fail;
        }
        switch (kind) {
        case KIND_DPE: accp = dpe_add(accp, dpe_mul(px, py)); break;
        case KIND_DD:  accd = dd_add(accd, dd_mul(dx, dy)); break;
        default:       accq = qd_add(accq, qd_mul(qx, qy)); break;
        }
    }
    if (kind < 0) kind = KIND_DD;
    out = (PyObject *)fp_make(kind, accp, accd, accq);
fail:
    Py_XDECREF(uf);
    Py_XDECREF(vf);
    return out;
}

static PyMethodDef mod_methods[] = {
    {"dpe", mod_dpe, METH_O, "dpe scalar from float/int"},
    {"dd", mod_dd, METH_O, "dd scalar from float/int (exact)"},
    {"qd", mod_qd, METH_O, "qd scalar from float/int (exact)"},
    {"dpe_me", mod_dpe_me, METH_VARARGS, "dpe from (mantissa, exp2)"},
    {"dd_pair", mod_dd_pair, METH_VARARGS, "dd from raw components"},
    {"qd_comp", mod_qd_comp, METH_VARARGS, "qd from raw components"},
    {"dot", mod_dot, METH_VARARGS, "sequential dot over fpnum sequences"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef fpnum_module = {
    PyModuleDef_HEAD_INIT, "fpnum",
    "compiled dpe/dd/qd scalar tower", -1, mod_methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit_fpnum(void)
{
    PyObject *m;
    if (PyType_Ready(&FpNumType) < 0) return NULL;
    m = PyModule_Create(&fpnum_module);
    if (!m) return NULL;
    Py_INCREF(&FpNumType);
    if (PyModule_AddObject(m, "fpnum", (PyObject *)&FpNumType) < 0) {
        Py_DECREF(&FpNumType);
        Py_DECREF(m);
        return NULL;
    }
    return m;
}
