/* libosmo-dsp + fftw3f stand-in kernels for the SDR parity oracle.
 *
 * libosmo-dsp is not vendored in /root/reference (SURVEY.md §2.6), so
 * these ~300 lines provide the complex-vector kernels the reference SDR
 * layer calls, with the SAME semantics the TPU build's gmr1_tpu/ops/
 * dsp.py implements (documented per function).  Everything above this
 * foundation — sync search, alignment, freq/phase estimation, soft-bit
 * quantization, burst catalogs, FCCH, DKAB (reference pi4cxpsk.c,
 * fcch.c, nb.c, dkab.c, ~2100 LoC) — runs as the unmodified reference C
 * and is what the parity tests exercise.
 *
 * Note on peak interpolation: libosmo-dsp's exact PEAK_EARLY_LATE /
 * PEAK_WEIGH_WIN refinements are approximated (3-point parabolic /
 * windowed centroid), mirroring gmr1_tpu/ops/dsp.py:105-137 exactly so
 * both sides share one agreed definition (SURVEY.md §7 hard part e:
 * parity within the SNR bound, not bit-exact sub-sample TOA).
 *
 * Status (round 5): closing this against upstream cxvec_math.c is not
 * possible in this environment — libosmo-dsp is not vendored by the
 * reference (configure.ac:25-27 external dep), is not installed in the
 * image, and the container has zero egress; re-implementing "upstream
 * semantics" from memory would just swap one unverifiable
 * approximation for another.  The sub-sample refinement only shifts
 * TOA by <1 sample; every decoded-bit parity test is insensitive to
 * it, and the demod aligns with sinc interpolation around the shared
 * definition, so the agreed-definition approach stays.
 */

#include <complex.h>
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <osmocom/dsp/cxvec.h>
#include <osmocom/dsp/cxvec_math.h>
#include <fftw3.h>

/* ------------------------------------------------------------------ */
/* container                                                           */
/* ------------------------------------------------------------------ */

struct osmo_cxvec *osmo_cxvec_alloc(int max_len)
{
	struct osmo_cxvec *cv;

	cv = malloc(sizeof(*cv) + sizeof(float complex) * max_len);
	if (!cv)
		return NULL;
	cv->len = 0;
	cv->max_len = max_len;
	cv->flags = 0;
	cv->data = &cv->_data[0];
	return cv;
}

void osmo_cxvec_init_from_data(struct osmo_cxvec *cv,
                               float complex *data, int len)
{
	cv->len = len;
	cv->max_len = len;
	cv->flags = 0;
	cv->data = data;
}

struct osmo_cxvec *osmo_cxvec_alloc_from_data(float complex *data, int len)
{
	struct osmo_cxvec *cv = osmo_cxvec_alloc(len);
	if (!cv)
		return NULL;
	memcpy(cv->data, data, sizeof(float complex) * len);
	cv->len = len;
	return cv;
}

void osmo_cxvec_free(struct osmo_cxvec *cv)
{
	free(cv);
}

void osmo_cxvec_dbg_dump(struct osmo_cxvec *cv, const char *fname)
{
	FILE *f = fopen(fname, "wb");
	if (!f)
		return;
	fwrite(cv->data, sizeof(float complex), cv->len, f);
	fclose(f);
}

/* ------------------------------------------------------------------ */
/* math kernels                                                        */
/* ------------------------------------------------------------------ */

float osmo_sinc(float x)
{
	if (x == 0.0f)
		return 1.0f;
	return sinf(x) / x;
}

/* out[i] = sig[i*decim] * e^{+j*freq_shift*i}, scaled to unit average
 * energy.  freq_shift is radians per OUTPUT sample.
 * (= gmr1_tpu/ops/dsp.py:sig_normalize) */
struct osmo_cxvec *
osmo_cxvec_sig_normalize(const struct osmo_cxvec *sig, int decim,
                         float freq_shift, struct osmo_cxvec *out)
{
	int i, l = sig->len / decim;
	float energy = 0.0f, norm;

	if (!out)
		out = osmo_cxvec_alloc(l);
	if (!out)
		return NULL;

	for (i = 0; i < l; i++)
		energy += osmo_normsqf(sig->data[i * decim]);
	energy /= (float)l;
	norm = 1.0f / sqrtf(fmaxf(energy, 1e-30f));

	for (i = 0; i < l; i++)
		out->data[i] = sig->data[i * decim] * norm *
			cexpf(I * freq_shift * (float)i);
	out->len = l;

	return out;
}

/* out[i] = sum_j conj(f[j]) * g[i + j*step],
 * i in [0, g->len - f->len*step + 1).  (= dsp.py:correlate) */
struct osmo_cxvec *
osmo_cxvec_correlate(const struct osmo_cxvec *f, const struct osmo_cxvec *g,
                     int g_corr_step, struct osmo_cxvec *out)
{
	int i, j, n_out = g->len - f->len * g_corr_step + 1;

	if (n_out < 1)
		n_out = 0;
	if (!out)
		out = osmo_cxvec_alloc(n_out);
	if (!out)
		return NULL;

	for (i = 0; i < n_out; i++) {
		float complex acc = 0.0f;
		for (j = 0; j < f->len; j++)
			acc += conjf(f->data[j]) * g->data[i + j * g_corr_step];
		out->data[i] = acc;
	}
	out->len = n_out;

	return out;
}

/* CONV_NO_DELAY: out[n] = sum_k f[k] * g[n + (f->len>>1) - k], same
 * length as g, zero outside g.  With the sinc pulse built at reference
 * pi4cxpsk.c:316-319 this yields out[n] ~= g(n + ofs_frac)
 * (= dsp.py:fractional_delay).  Other modes are unused by the
 * reference SDR layer. */
struct osmo_cxvec *
osmo_cxvec_convolve(const struct osmo_cxvec *f, const struct osmo_cxvec *g,
                    enum osmo_cxvec_conv_type type, struct osmo_cxvec *out)
{
	int n, k, half = f->len >> 1;

	if (type != CONV_NO_DELAY)
		return NULL;
	if (!out)
		out = osmo_cxvec_alloc(g->len);
	if (!out)
		return NULL;

	for (n = 0; n < g->len; n++) {
		float complex acc = 0.0f;
		for (k = 0; k < f->len; k++) {
			int m = n + half - k;
			if (m >= 0 && m < g->len)
				acc += f->data[k] * g->data[m];
		}
		out->data[n] = acc;
	}
	out->len = g->len;

	return out;
}

/* out[i] = v[i] * e^{+j*rps*i} (in-place safe) */
struct osmo_cxvec *
osmo_cxvec_rotate(const struct osmo_cxvec *v, float rps,
                  struct osmo_cxvec *out)
{
	int i;

	if (!out)
		out = osmo_cxvec_alloc(v->len);
	if (!out)
		return NULL;
	for (i = 0; i < v->len; i++)
		out->data[i] = v->data[i] * cexpf(I * rps * (float)i);
	out->len = v->len;
	return out;
}

struct osmo_cxvec *
osmo_cxvec_scale(const struct osmo_cxvec *v, float complex scale,
                 struct osmo_cxvec *out)
{
	int i;

	if (!out)
		out = osmo_cxvec_alloc(v->len);
	if (!out)
		return NULL;
	for (i = 0; i < v->len; i++)
		out->data[i] = v->data[i] * scale;
	out->len = v->len;
	return out;
}

/* Windowed-energy peak search with sub-sample refinement.
 * Mirrors gmr1_tpu/ops/dsp.py:peak_energy_find exactly:
 *  - windowed energy ew[i] = sum e[i-half .. i+win-1-half] (zero pad)
 *  - idx = first argmax of ew, peak_val = sig[idx]
 *  - EARLY_LATE: 3-point parabolic on RAW bin energies around idx
 *    (incl. dsp.py's max(denom,1e-20) guard), frac clipped to [-1,1]
 *  - WEIGH_WIN: energy centroid over idx+[-half..half], positions
 *    clamped to [0, len-1]. */
float
osmo_cxvec_peak_energy_find(struct osmo_cxvec *sig, int win_size,
                            enum osmo_cxvec_peak_alg alg,
                            float complex *peak_val_p)
{
	int i, n = sig->len, half = win_size >> 1;
	int idx = 0;
	float best = -1.0f, toa;
	float *e;

	e = malloc(sizeof(float) * n);
	if (!e)
		return 0.0f;
	for (i = 0; i < n; i++)
		e[i] = osmo_normsqf(sig->data[i]);

	for (i = 0; i < n; i++) {
		float ew = 0.0f;
		int j;
		for (j = i - half; j < i - half + win_size; j++)
			if (j >= 0 && j < n)
				ew += e[j];
		if (ew > best) {
			best = ew;
			idx = i;
		}
	}

	if (peak_val_p)
		*peak_val_p = sig->data[idx];

	if (alg == PEAK_EARLY_LATE) {
		int im = idx - 1 < 0 ? 0 : idx - 1;
		int ip = idx + 1 > n - 1 ? n - 1 : idx + 1;
		float e0 = e[im], e1 = e[idx], e2 = e[ip];
		float denom = 2.0f * e1 - e0 - e2;
		float frac = 0.0f;
		if (fabsf(denom) > 1e-20f)
			frac = 0.5f * (e2 - e0) / fmaxf(denom, 1e-20f);
		if (frac > 1.0f)
			frac = 1.0f;
		if (frac < -1.0f)
			frac = -1.0f;
		toa = (float)idx + frac;
	} else { /* PEAK_WEIGH_WIN */
		float num = 0.0f, den = 0.0f;
		for (i = -half; i <= half; i++) {
			int p = idx + i;
			if (p < 0)
				p = 0;
			if (p > n - 1)
				p = n - 1;
			num += e[p] * (float)p;
			den += e[p];
		}
		toa = num / fmaxf(den, 1e-20f);
	}

	free(e);
	return toa;
}

/* Indices of the N highest-energy bins, descending
 * (= dsp.py:peaks_scan / lax.top_k). */
int osmo_cxvec_peaks_scan(struct osmo_cxvec *sig, int *peaks, int N)
{
	int i, k, n = sig->len;
	float *e = malloc(sizeof(float) * n);

	if (!e)
		return -1;
	for (i = 0; i < n; i++)
		e[i] = osmo_normsqf(sig->data[i]);

	for (k = 0; k < N; k++) {
		int best_i = 0;
		float best = -1.0f;
		for (i = 0; i < n; i++) {
			if (e[i] > best) {
				best = e[i];
				best_i = i;
			}
		}
		peaks[k] = best_i;
		e[best_i] = -2.0f;
	}

	free(e);
	return N;
}

/* ------------------------------------------------------------------ */
/* fftw3f stand-in: naive unnormalized DFT (lengths 117/468 only)      */
/* ------------------------------------------------------------------ */

struct oracle_fftwf_plan_s {
	int n;
	int sign;
	fftwf_complex *in;
	fftwf_complex *out;
};

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags)
{
	fftwf_plan p = malloc(sizeof(*p));
	(void)flags;
	p->n = n;
	p->sign = sign;
	p->in = in;
	p->out = out;
	return p;
}

void fftwf_execute(fftwf_plan p)
{
	int j, k, n = p->n;
	float complex *tmp = malloc(sizeof(float complex) * n);

	for (k = 0; k < n; k++) {
		/* double-precision accumulation + exact angle reduction:
		 * stands in for fftw's (much more accurate than naive
		 * float) transform */
		double complex acc = 0.0;
		for (j = 0; j < n; j++) {
			double ang = (double)p->sign * 2.0 * M_PI *
				(double)((long)j * k % n) / (double)n;
			acc += (double complex)p->in[j] *
				cexp(I * ang);
		}
		tmp[k] = (float complex)acc;
	}
	memcpy(p->out, tmp, sizeof(float complex) * n);
	free(tmp);
}

void fftwf_destroy_plan(fftwf_plan p)
{
	free(p);
}
