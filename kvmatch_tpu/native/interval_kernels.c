/* Native phase-1 interval kernels.
 *
 * The reference's candidate-set intersection is a serial two-pointer merge in
 * Java (QueryEngine.java:279-305, NormQueryEngine.java:334-399).  Our NumPy
 * path vectorizes it, but for the cNSM engines the per-segment interval volume
 * makes the many small array passes the phase-1 bottleneck.  This C version
 * fuses the whole CS x CS_i step — overlap enumeration, epsilon-budget sum,
 * beta-bitmask AND, derived-sigma filter — into ONE linear two-pointer pass at
 * memory speed.  Both inputs must be sorted by left and disjoint (guaranteed by
 * BaseEngine._gather_rows / merge_intervals); the output is sorted.
 *
 * Built at import time with cc -O3 (kvmatch_tpu/native/__init__.py); the NumPy
 * path remains as a fallback and as the semantics reference in tests.
 */

#include <stdint.h>
#include <math.h>

/* RSM engines: payloads = accumulated epsilon lower bound.
 * Emits every overlap piece with eps_a + eps_b <= eps2.
 * Returns the piece count; output capacity must be >= na + nb. */
long intersect_ed(
    long na, const int64_t *al, const int64_t *ar, const double *ae,
    long nb, const int64_t *bl, const int64_t *br, const double *be,
    double eps2,
    int64_t *ol, int64_t *orr, double *oe)
{
    long i = 0, j = 0, k = 0;
    while (i < na && j < nb) {
        if (ar[i] < bl[j]) { i++; continue; }
        if (br[j] < al[i]) { j++; continue; }
        double es = ae[i] + be[j];
        if (es <= eps2) {
            ol[k] = al[i] > bl[j] ? al[i] : bl[j];
            orr[k] = ar[i] < br[j] ? ar[i] : br[j];
            oe[k] = es;
            k++;
        }
        if (ar[i] < br[j]) i++; else j++;
    }
    return k;
}

/* cNSM engines: payloads = eps + Ex/Ex2 bound tracks + beta bitmask.
 * Filters: eps budget, beta-mask AND (when use_beta), derived-sigma lower bound
 * in both directions (when use_std; NormQueryEngine.java:354-382,
 * NormQueryEngineDtw.java:370-389 with our conservative bound tracks).
 * p_units = unit windows covered so far INCLUDING this segment. */
long intersect_norm(
    long na, const int64_t *al, const int64_t *ar, const double *ae,
    const double *a_exlo, const double *a_ex2lo,
    const double *a_exup, const double *a_ex2up, const uint64_t *a_beta,
    long nb, const int64_t *bl, const int64_t *br, const double *be,
    const double *b_exlo, const double *b_ex2lo,
    const double *b_exup, const double *b_ex2up, const uint64_t *b_beta,
    double eps2, int use_beta, int use_std,
    double unit, double qlen, double p_units,
    double alpha, double beta, double mu_q, double sd_q,
    int64_t *ol, int64_t *orr, double *oe,
    double *o_exlo, double *o_ex2lo, double *o_exup, double *o_ex2up,
    uint64_t *o_beta)
{
    long i = 0, j = 0, k = 0;
    double limit = alpha * alpha * sd_q * sd_q + 1e-12;
    double rest = qlen - p_units * unit;
    while (i < na && j < nb) {
        if (ar[i] < bl[j]) { i++; continue; }
        if (br[j] < al[i]) { j++; continue; }

        double es = ae[i] + be[j];
        int keep = es <= eps2;
        uint64_t bits = a_beta[i] & b_beta[j];
        if (keep && use_beta && bits == 0) keep = 0;

        double exlo = a_exlo[i] + b_exlo[j];
        double ex2lo = a_ex2lo[i] + b_ex2lo[j];
        double exup = a_exup[i] + b_exup[j];
        double ex2up = a_ex2up[i] + b_ex2up[j];
        if (keep && use_std) {
            if (rest > 0) {
                double mean_lo = exlo / p_units;
                if (mean_lo > mu_q + beta) {
                    double nv = mu_q + beta -
                        (mean_lo - mu_q - beta) * p_units * unit / rest;
                    double var2 = (ex2lo * unit + rest * nv * nv) / qlen -
                        (mu_q + beta) * (mu_q + beta);
                    if (var2 > limit) keep = 0;
                }
                if (keep) {
                    double mean_up = exup / p_units;
                    if (mean_up < mu_q - beta) {
                        double nv = mu_q - beta +
                            (mu_q - beta - mean_up) * p_units * unit / rest;
                        double var2 = (ex2lo * unit + rest * nv * nv) / qlen -
                            (mu_q - beta) * (mu_q - beta);
                        if (var2 > limit) keep = 0;
                    }
                }
            } else {
                double mean_lo = exlo / p_units;
                double mean_up = exup / p_units;
                double var_lb = 0.0;
                if (mean_up < mu_q - beta) {
                    double d = mu_q - beta - mean_up;
                    var_lb = d * d;
                } else if (mean_lo > mu_q + beta) {
                    double d = mean_lo - mu_q - beta;
                    var_lb = d * d;
                }
                if (var_lb > limit) keep = 0;
            }
        }

        if (keep) {
            ol[k] = al[i] > bl[j] ? al[i] : bl[j];
            orr[k] = ar[i] < br[j] ? ar[i] : br[j];
            oe[k] = es;
            o_exlo[k] = exlo;
            o_ex2lo[k] = ex2lo;
            o_exup[k] = exup;
            o_ex2up[k] = ex2up;
            o_beta[k] = bits;
            k++;
        }
        if (ar[i] < br[j]) i++; else j++;
    }
    return k;
}

/* Coalesce a sorted interval list: merge overlapping/adjacent runs with min-eps
 * combine (sortAndMergeIntervals, QueryEngine.java:664-693). */
long merge_sorted_ed(
    long n, const int64_t *l, const int64_t *r, const double *e,
    int64_t *ol, int64_t *orr, double *oe)
{
    if (n == 0) return 0;
    long k = 0;
    int64_t cl = l[0], cr = r[0];
    double ce = e[0];
    for (long i = 1; i < n; i++) {
        if (l[i] - 1 <= cr) {
            if (r[i] > cr) cr = r[i];
            if (e[i] < ce) ce = e[i];
        } else {
            ol[k] = cl; orr[k] = cr; oe[k] = ce; k++;
            cl = l[i]; cr = r[i]; ce = e[i];
        }
    }
    ol[k] = cl; orr[k] = cr; oe[k] = ce; k++;
    return k;
}

/* Fused segment scan: walk a slice of the position-sorted interval view and
 * emit the intervals belonging to rows [i0, i1) together with their per-row
 * payload columns (scanIndex, QueryEngine.java:504-518 / NormQueryEngine.java:
 * 672-701, minus the KV-store round trip).  Output is sorted by left because
 * the input view is.  Row payload arrays are indexed by (row - i0).
 * ncols: 1 = eps only (RSM), 6 = eps + Ex/Ex2 tracks + beta (cNSM).
 * min_right: only emit intervals with right >= min_right (span filtering).
 * Returns the interval count; capacity np_. */
long scan_fill(
    long np_, const int64_t *pl, const int64_t *pr, const int64_t *prow,
    long i0, long i1, int64_t min_right,
    const double *row_eps, const double *row_exlo, const double *row_ex2lo,
    const double *row_exup, const double *row_ex2up, const uint64_t *row_beta,
    int ncols,
    int64_t *ol, int64_t *orr, double *oe,
    double *o_exlo, double *o_ex2lo, double *o_exup, double *o_ex2up,
    uint64_t *o_beta)
{
    long k = 0;
    for (long t = 0; t < np_; t++) {
        long r = prow[t];
        if (r < i0 || r >= i1 || pr[t] < min_right) continue;
        long ri = r - i0;
        ol[k] = pl[t];
        orr[k] = pr[t];
        oe[k] = row_eps[ri];
        if (ncols > 1) {
            o_exlo[k] = row_exlo[ri];
            o_ex2lo[k] = row_ex2lo[ri];
            o_exup[k] = row_exup[ri];
            o_ex2up[k] = row_ex2up[ri];
            o_beta[k] = row_beta[ri];
        }
        k++;
    }
    return k;
}

/* Exact float64 banded DTW (Sakoe-Chiba radius r) for a batch of candidate
 * windows — the host confirmation kernel (semantics of DtwUtils.dtw,
 * DtwUtils.java:269-337, without early abandon).  a: (nb, m) row-major windows,
 * q: (m,) query, out: (nb,) squared distances.  work: scratch of 2*(m+2).
 */
void dtw_band_f64(
    long nb, long m, long r,
    const double *a, const double *q, double *out, double *work)
{
    double *prev = work;
    double *cur = work + (m + 2);
    const double INF = 1e300;
    for (long b = 0; b < nb; b++) {
        const double *x = a + b * m;
        for (long j = 0; j <= m; j++) prev[j] = INF;
        for (long i = 0; i < m; i++) {
            long j_lo = i - r < 0 ? 0 : i - r;
            long j_hi = i + r >= m ? m - 1 : i + r;
            for (long j = 0; j <= m; j++) cur[j] = INF;
            double run = INF;
            for (long j = j_lo; j <= j_hi; j++) {
                double d = x[i] - q[j];
                d *= d;
                double best;
                if (i == 0 && j == 0) {
                    best = 0.0;
                } else {
                    best = prev[j + 1];              /* vertical (i-1, j)   */
                    if (j > 0 && prev[j] < best) best = prev[j];  /* diag  */
                    if (run < best) best = run;      /* horizontal (i, j-1) */
                }
                run = best + d;
                cur[j + 1] = run;
            }
            double *t = prev; prev = cur; cur = t;
        }
        out[b] = prev[m];
    }
}

/* Fused bucket pass for host-side index builds: window means from the f64
 * prefix-sum array straight to int32 bucket ids (2*floor(v*s) + half-step),
 * one read + one write per output element.  Mirrors the device kernel
 * (ops/sliding.py bucketize_means) and the reference's running-mean toRound
 * pipeline (IndexBuilder.java:239-259, MeanIntervalUtils.java:51-61); replaces
 * ~7 NumPy temporaries with a single stream at memory speed.  c1 has n+1
 * entries (c1[0] = 0), m = n - w + 1 outputs. */
void bucket_pass(const double *c1, long m, long w, double scale, int32_t *out)
{
    double inv = scale / (double)w;
    for (long i = 0; i < m; i++) {
        double v = (c1[i + w] - c1[i]) * inv;
        double iv = floor(v);
        out[i] = (int32_t)(2 * (long)iv + (v - iv >= 0.5 ? 1 : 0));
    }
}
