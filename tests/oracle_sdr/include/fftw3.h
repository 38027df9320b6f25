/* Minimal fftw3f stand-in for the SDR parity oracle: a naive O(N^2)
 * complex DFT with fftw's sign/normalization conventions (forward =
 * e^{-2*pi*i*j*k/N}, unnormalized).  The reference only plans lengths
 * 117 and 468 (fcch.c:583-589,684), so the naive transform is fine.
 * Declared over float complex* (layout-identical to fftwf_complex)
 * so the reference's calls compile without casts. */
#ifndef ORACLE_FFTW3_H
#define ORACLE_FFTW3_H

#include <complex.h>

typedef float complex fftwf_complex;
typedef struct oracle_fftwf_plan_s *fftwf_plan;

#define FFTW_FORWARD  (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_ESTIMATE (1U << 6)

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags);
void fftwf_execute(fftwf_plan p);
void fftwf_destroy_plan(fftwf_plan p);

#endif
