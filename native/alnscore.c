/* Banded global alignment score with free-ish end gaps.
 *
 * Original implementation of the scoring semantics the reference's hybrid
 * correction uses to rank FM-walk candidate paths (Thirdparty/stdaln.c
 * aln_global_core under aln_param_pacbio = {open 1, ext 1, end 0,
 * aln_sm_pacbio, 5, band 50}).  Semantics reproduced from the recurrence
 * spec (not the code): affine M/I/D DP over a band; I consumes a seq2
 * char (vertical), D consumes a seq1 char (horizontal, in-row chain);
 * edge rows/columns charge gap_end (0) instead of gap_ext so end gaps
 * cost only the open penalty; score = max(M, I, D) at (len1, len2).
 * Band geometry: b1 = len1>len2 ? len1-len2+b : b (clamped to len1),
 * b2 symmetric; row j computes i in [max(j-b2,0)+1 .. min(j+b1-1,len1)],
 * with the band-interior right edge getting no I state and the i = 0
 * column getting the free-end I chain.
 *
 * Compiled as a shared library; called from Python via ctypes
 * (longreadselfcorrect_tpu/core/stdaln.py).
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define NEG  (-1073741823)

static inline int64_t max2(int64_t a, int64_t b) { return a > b ? a : b; }
static inline int64_t max3(int64_t a, int64_t b, int64_t c) {
    return max2(max2(a, b), c);
}

/* seqs are 0..4 codes in the A,G,C,T,N order of the reference table */
static const int SM[5][5] = {
    { 1, -8, -8, -8, -2},
    {-8,  1, -8, -8, -2},
    {-8, -8,  1, -8, -2},
    {-8, -8, -8,  1, -2},
    {-2, -2, -2, -2, -2},
};

int aln_global_score(const uint8_t *a1, int len1, const uint8_t *a2, int len2,
                     int gap_open, int gap_ext, int gap_end, int band)
{
    if (len1 == 0 || len2 == 0) return 0;

    int b1, b2;
    if (len1 > len2) { b1 = len1 - len2 + band; b2 = band; }
    else             { b1 = band; b2 = len2 - len1 + band; }
    if (b1 > len1) b1 = len1;
    if (b2 > len2) b2 = len2;

    int w = len1 + 1;
    int64_t *M  = malloc(sizeof(int64_t) * w);
    int64_t *I  = malloc(sizeof(int64_t) * w);
    int64_t *D  = malloc(sizeof(int64_t) * w);
    int64_t *Mn = malloc(sizeof(int64_t) * w);
    int64_t *In = malloc(sizeof(int64_t) * w);
    int64_t *Dn = malloc(sizeof(int64_t) * w);

    for (int i = 0; i < w; ++i) M[i] = I[i] = D[i] = NEG;
    M[0] = 0;
    /* row 0: free-end D chain along the top edge, only within the band */
    for (int i = 1; i < b1; ++i)
        D[i] = max2(M[i - 1] - gap_open - gap_end, D[i - 1] - gap_end);

    /* row classification thresholds (b2 >= len2 means full width: every
       row is "part 1" shaped and row len2 charges gap_end on D) */
    int p2_hi = len2 - b2 + 1;          /* last part-2 row when b2 < len2 */

    for (int j = 1; j <= len2; ++j) {
        int lo = j - b2; if (lo < 0) lo = 0;
        int hi = j + b1 - 1; if (hi > len1) hi = len1;
        int part1 = (j <= b2);
        int part2 = (!part1) && (j <= p2_hi);
        int lastrow = (j == len2);
        int dext = lastrow ? gap_end : gap_ext;

        for (int i = lo; i <= hi; ++i) Mn[i] = In[i] = Dn[i] = NEG;

        if (part1) {
            /* i == 0 cell: free-end I chain down the left edge */
            In[0] = max2(M[0] - gap_open - gap_end, I[0] - gap_end);
        }
        const int *mat = SM[a2[j - 1]];
        for (int i = lo + 1; i <= hi; ++i) {
            Mn[i] = max3(M[i - 1], I[i - 1], D[i - 1]) + mat[a1[i - 1]];
            Dn[i] = max2(Mn[i - 1] - gap_open - dext, Dn[i - 1] - dext);
        }
        for (int i = lo + 1; i < hi; ++i)
            In[i] = max2(M[i] - gap_open - gap_ext, I[i] - gap_ext);
        /* right edge of the band */
        if (hi == len1) {
            int over = (j + b1 - 1 > len1);
            if ((part1 && over) || (!part1 && !part2))
                In[len1] = max2(M[len1] - gap_open - gap_end,
                                I[len1] - gap_end);
            /* part-1 row exactly at the band edge, or any part-2 row:
               no I state at the right edge */
        } else {
            In[hi] = NEG;
        }

        int64_t *t;
        t = M; M = Mn; Mn = t;
        t = I; I = In; In = t;
        t = D; D = Dn; Dn = t;
    }

    int64_t best = max3(M[len1], I[len1], D[len1]);
    free(M); free(I); free(D); free(Mn); free(In); free(Dn);
    return (int)best;
}
