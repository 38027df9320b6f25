/* Minimal libosmo-dsp cxvec.h stand-in for the SDR parity oracle.
 *
 * The reference SDR layer (/root/reference/src/sdr/) depends on
 * libosmo-dsp, which is not vendored in the reference tree
 * (SURVEY.md §2.6).  This header reproduces just the container API the
 * reference uses; the semantics of the math kernels live in shim.c and
 * are the same semantics the JAX implementation (gmr1_tpu/ops/dsp.py)
 * was built against, so the oracle and the TPU build share one agreed
 * DSP foundation while the ~2100 lines of reference demod logic on top
 * are exercised unmodified. */
#ifndef ORACLE_OSMO_DSP_CXVEC_H
#define ORACLE_OSMO_DSP_CXVEC_H

#include <complex.h>

#ifndef M_PIf
#define M_PIf 3.14159265358979323846f
#endif

#define CXVEC_FLG_REAL_ONLY (1 << 0)

struct osmo_cxvec {
	int len;
	int max_len;
	int flags;
	float complex *data;
	float complex _data[0];
};

void osmo_cxvec_init_from_data(struct osmo_cxvec *cv,
                               float complex *data, int len);
struct osmo_cxvec *osmo_cxvec_alloc_from_data(float complex *data, int len);
struct osmo_cxvec *osmo_cxvec_alloc(int max_len);
void osmo_cxvec_free(struct osmo_cxvec *cv);
void osmo_cxvec_dbg_dump(struct osmo_cxvec *cv, const char *fname);

#endif
