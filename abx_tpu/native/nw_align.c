/* Semi-global Needleman-Wunsch alignment (query end-gaps free).
 *
 * Native data-path component: antibody numbering aligns every chain against
 * germline templates (abx_tpu/preprocess/numbering.py); for bulk SAbDab
 * preprocessing the Python DP is the host-side hot spot.  Row-major DP with
 * int16 scores; traceback emitted as (query_idx, template_idx) pairs.
 *
 * Build: gcc -O2 -shared -fPIC nw_align.c -o libnwalign.so
 */

#include <stdlib.h>
#include <string.h>

/* Returns number of aligned pairs written to out_qi/out_ti (each sized
 * nq+nt), or -1 on allocation failure. */
int nw_align(const char *q, int nq, const char *t, int nt,
             int match, int mismatch, int gap,
             int *out_qi, int *out_ti) {
    int stride = nt + 1;
    int *score = (int *)malloc(sizeof(int) * (nq + 1) * stride);
    signed char *ptr = (signed char *)malloc((nq + 1) * stride);
    if (!score || !ptr) { free(score); free(ptr); return -1; }

    score[0] = 0; ptr[0] = 0;
    for (int j = 1; j <= nt; ++j) {           /* template gaps penalised */
        score[j] = score[j - 1] + gap;
        ptr[j] = 2;
    }
    for (int i = 1; i <= nq; ++i) {           /* free leading query gaps */
        score[i * stride] = 0;
        ptr[i * stride] = 1;
    }
    for (int i = 1; i <= nq; ++i) {
        char qc = q[i - 1];
        const int *prev = score + (i - 1) * stride;
        int *cur = score + i * stride;
        signed char *pcur = ptr + i * stride;
        for (int j = 1; j <= nt; ++j) {
            int s = (qc == t[j - 1]) ? match : mismatch;
            int diag = prev[j - 1] + s;
            /* interior query gaps penalised; free only at template ends */
            int up = prev[j] + ((j > 0 && j < nt) ? gap : 0);
            int left = cur[j - 1] + gap;
            int best = diag; signed char p = 0;
            if (up > best) { best = up; p = 1; }
            if (left > best) { best = left; p = 2; }
            cur[j] = best;
            pcur[j] = p;
        }
    }
    /* Traceback from the best score in the last template column. */
    int bi = 0, bbest = score[nt];
    for (int i = 1; i <= nq; ++i) {
        if (score[i * stride + nt] > bbest) { bbest = score[i * stride + nt]; bi = i; }
    }
    int i = bi, j = nt, n = 0;
    int cap = nq + nt;
    int *ri = (int *)malloc(sizeof(int) * cap);
    int *rj = (int *)malloc(sizeof(int) * cap);
    if (!ri || !rj) { free(score); free(ptr); free(ri); free(rj); return -1; }
    while (i > 0 && j > 0) {
        signed char p = ptr[i * stride + j];
        if (p == 0) { ri[n] = i - 1; rj[n] = j - 1; ++n; --i; --j; }
        else if (p == 1) { --i; }
        else { --j; }
    }
    for (int k = 0; k < n; ++k) {             /* reverse into outputs */
        out_qi[k] = ri[n - 1 - k];
        out_ti[k] = rj[n - 1 - k];
    }
    free(score); free(ptr); free(ri); free(rj);
    return n;
}
