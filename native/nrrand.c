/* Numerical Recipes ran0/rang batch generators.
 *
 * Bit-exact reimplementation of the reference RNG
 * (reference src/utils/random.f90: RAN0 = Park-Miller minimal standard
 * with Bays-Durham shuffle, RANG = Box-Muller with rejection) so the
 * inirand initial conditions reproduce the reference realization exactly.
 * State vector layout (int64[34]): [idum, iv[0..31], iy] -- owned by the
 * Python caller (tlab_tpu/utils/nrrandom.py), passed in/out by pointer.
 */
#include <stdint.h>
#include <math.h>

#define IA 16807
#define IM 2147483647
#define IQ 127773
#define IR 2836
#define NTAB 32

static double ran0(int64_t *st)
{
    /* st[0] = idum, st[1..32] = iv, st[33] = iy */
    const int64_t NDIV = 1 + (IM - 1) / NTAB;
    const double AM = 1.0 / (double)IM;
    const double RNMX = 1.0 - 1.2e-7;
    int64_t j, k;

    if (st[0] <= 0 || st[33] == 0) {
        st[0] = (-st[0] > 1) ? -st[0] : 1;
        for (j = NTAB + 8; j >= 1; j--) {
            k = st[0] / IQ;
            st[0] = IA * (st[0] - k * IQ) - IR * k;
            if (st[0] < 0) st[0] += IM;
            if (j <= NTAB) st[j] = st[0];
        }
        st[33] = st[1];
    }
    k = st[0] / IQ;
    st[0] = IA * (st[0] - k * IQ) - IR * k;
    if (st[0] < 0) st[0] += IM;
    j = 1 + st[33] / NDIV;
    st[33] = st[j];
    st[j] = st[0];
    {
        double r = AM * (double)st[33];
        return (r < RNMX) ? r : RNMX;
    }
}

void nr_fill_uniform(int64_t *state, double *out, int64_t n)
{
    int64_t i;
    for (i = 0; i < n; i++) out[i] = ran0(state);
}

void nr_fill_gaussian(int64_t *state, double *out, int64_t n,
                      double mean, double sigma)
{
    int64_t i;
    double v1, v2, r;
    for (i = 0; i < n; i++) {
        do {
            v1 = 2.0 * ran0(state) - 1.0;
            v2 = 2.0 * ran0(state) - 1.0;
            r = v1 * v1 + v2 * v2;
        } while (r >= 1.0);
        v2 = v1 * sqrt(-2.0 * log(r) / r);
        out[i] = mean + v2 * sigma;
    }
}
