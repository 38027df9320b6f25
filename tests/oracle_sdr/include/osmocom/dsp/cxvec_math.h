/* Minimal libosmo-dsp cxvec_math.h stand-in for the SDR parity oracle.
 * See cxvec.h for the rationale.  Declarations cover exactly the
 * symbols the reference SDR layer calls (SURVEY.md §2.6 table). */
#ifndef ORACLE_OSMO_DSP_CXVEC_MATH_H
#define ORACLE_OSMO_DSP_CXVEC_MATH_H

#include <complex.h>
#include <osmocom/dsp/cxvec.h>

/* |v|^2 */
static inline float osmo_normsqf(float complex v)
{
	return crealf(v) * crealf(v) + cimagf(v) * cimagf(v);
}

/* sin(x)/x (argument already in radians; reference pi4cxpsk.c:317
 * passes M_PIf * offset). */
float osmo_sinc(float x);

enum osmo_cxvec_conv_type {
	CONV_FULL_SPAN,
	CONV_OVERLAP_ONLY,
	CONV_NO_DELAY,
};

enum osmo_cxvec_peak_alg {
	PEAK_EARLY_LATE,
	PEAK_WEIGH_WIN,
};

struct osmo_cxvec *
osmo_cxvec_convolve(const struct osmo_cxvec *f, const struct osmo_cxvec *g,
                    enum osmo_cxvec_conv_type type, struct osmo_cxvec *out);

struct osmo_cxvec *
osmo_cxvec_correlate(const struct osmo_cxvec *f, const struct osmo_cxvec *g,
                     int g_corr_step, struct osmo_cxvec *out);

struct osmo_cxvec *
osmo_cxvec_rotate(const struct osmo_cxvec *v, float rps,
                  struct osmo_cxvec *out);

struct osmo_cxvec *
osmo_cxvec_sig_normalize(const struct osmo_cxvec *sig, int decim,
                         float freq_shift, struct osmo_cxvec *out);

struct osmo_cxvec *
osmo_cxvec_scale(const struct osmo_cxvec *v, float complex scale,
                 struct osmo_cxvec *out);

float
osmo_cxvec_peak_energy_find(struct osmo_cxvec *sig, int win_size,
                            enum osmo_cxvec_peak_alg alg,
                            float complex *peak_val_p);

int osmo_cxvec_peaks_scan(struct osmo_cxvec *sig, int *peaks, int N);

#endif
