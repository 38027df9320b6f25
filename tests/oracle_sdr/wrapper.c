/* Flat ctypes-friendly API over the reference SDR layer, for the
 * parity oracle.  The actual demodulation logic is the UNMODIFIED
 * reference C (pi4cxpsk.c / fcch.c / nb.c / dkab.c) compiled against
 * the shim kernels (shim.c).  IQ buffers are float32 interleaved
 * (re, im) — the same memory layout as the TPU build's planar
 * (..., n, 2) arrays. */

#include <complex.h>
#include <string.h>

#include <osmocom/core/bits.h>
#include <osmocom/dsp/cxvec.h>

#include <osmocom/gmr1/sdr/pi4cxpsk.h>
#include <osmocom/gmr1/sdr/nb.h>
#include <osmocom/gmr1/sdr/fcch.h>
#include <osmocom/gmr1/sdr/dkab.h>

static struct gmr1_pi4cxpsk_burst *
burst_by_name(const char *name)
{
	static const struct {
		const char *name;
		struct gmr1_pi4cxpsk_burst *bt;
	} tbl[] = {
		{ "bcch",       &gmr1_bcch_burst },
		{ "dc2",        &gmr1_dc2_burst },
		{ "dc6",        &gmr1_dc6_burst },
		{ "dc12",       &gmr1_dc12_burst },
		{ "nt3_speech", &gmr1_nt3_speech_burst },
		{ "nt3_facch",  &gmr1_nt3_facch_burst },
		{ "nt6",        &gmr1_nt6_burst },
		{ "nt9",        &gmr1_nt9_burst },
		{ "rach",       &gmr1_rach_burst },
		{ "sdcch",      &gmr1_sdcch_burst },
	};
	unsigned i;

	for (i = 0; i < sizeof(tbl) / sizeof(tbl[0]); i++)
		if (!strcmp(name, tbl[i].name))
			return tbl[i].bt;
	return NULL;
}

static const struct gmr1_fcch_burst *
fcch_by_name(const char *name)
{
	if (!strcmp(name, "fcch"))
		return &gmr1_fcch_burst;
	if (!strcmp(name, "fcch3_lband"))
		return &gmr1_fcch3_lband_burst;
	if (!strcmp(name, "fcch3_sband"))
		return &gmr1_fcch3_sband_burst;
	return NULL;
}

int oracle_burst_info(const char *name, int *len, int *ebits, int *nsync,
                      int *guard_pre, int *guard_post)
{
	struct gmr1_pi4cxpsk_burst *bt = burst_by_name(name);
	int n;

	if (!bt)
		return -1;
	*len = bt->len;
	*ebits = bt->ebits;
	for (n = 0; (n < GMR1_MAX_SYNC) && bt->sync[n]; n++)
		;
	*nsync = n;
	*guard_pre = bt->guard_pre;
	*guard_post = bt->guard_post;
	return 0;
}

int oracle_demod(const char *name, const float *iq, int nsamp, int sps,
                 float freq_shift, int8_t *ebits, int *sync_id, float *toa,
                 float *freq_err)
{
	struct gmr1_pi4cxpsk_burst *bt = burst_by_name(name);
	struct osmo_cxvec bv;

	if (!bt)
		return -1;
	osmo_cxvec_init_from_data(&bv, (float complex *)iq, nsamp);
	return gmr1_pi4cxpsk_demod(bt, &bv, sps, freq_shift,
	                           (sbit_t *)ebits, sync_id, toa, freq_err);
}

int oracle_detect(const char **names, int n_types, float e_toa,
                  const float *iq, int nsamp, int sps, float freq_shift,
                  int *bt_id, int *sync_id, float *toa)
{
	struct gmr1_pi4cxpsk_burst *bts[8];
	struct osmo_cxvec bv;
	int i;

	if (n_types > 7)
		return -1;
	for (i = 0; i < n_types; i++) {
		bts[i] = burst_by_name(names[i]);
		if (!bts[i])
			return -1;
	}
	bts[n_types] = NULL;
	osmo_cxvec_init_from_data(&bv, (float complex *)iq, nsamp);
	return gmr1_pi4cxpsk_detect(bts, e_toa, &bv, sps, freq_shift,
	                            bt_id, sync_id, toa);
}

int oracle_mod_order(const float *iq, int nsamp, int sps, float freq_shift)
{
	struct osmo_cxvec bv;

	osmo_cxvec_init_from_data(&bv, (float complex *)iq, nsamp);
	return gmr1_pi4cxpsk_mod_order(&bv, sps, freq_shift);
}

/* iq_out must hold bt->len complex samples; returns bt->len or <0. */
int oracle_mod(const char *name, const uint8_t *ebits, int sync_id,
               float *iq_out)
{
	struct gmr1_pi4cxpsk_burst *bt = burst_by_name(name);
	struct osmo_cxvec bv;
	int rv;

	if (!bt)
		return -1;
	osmo_cxvec_init_from_data(&bv, (float complex *)iq_out, bt->len);
	bv.len = 0;
	bv.max_len = bt->len;
	rv = gmr1_pi4cxpsk_mod(bt, (ubit_t *)ebits, sync_id, &bv);
	return rv < 0 ? rv : bt->len;
}

int oracle_fcch_rough(const char *variant, const float *iq, int nsamp,
                      int sps, float freq_shift, int *toa)
{
	const struct gmr1_fcch_burst *ft = fcch_by_name(variant);
	struct osmo_cxvec bv;

	if (!ft)
		return -1;
	osmo_cxvec_init_from_data(&bv, (float complex *)iq, nsamp);
	return gmr1_fcch_rough(ft, &bv, sps, freq_shift, toa);
}

int oracle_fcch_rough_multi(const char *variant, const float *iq, int nsamp,
                            int sps, float freq_shift, int *toa_arr, int N)
{
	const struct gmr1_fcch_burst *ft = fcch_by_name(variant);
	struct osmo_cxvec bv;

	if (!ft)
		return -1;
	osmo_cxvec_init_from_data(&bv, (float complex *)iq, nsamp);
	return gmr1_fcch_rough_multi(ft, &bv, sps, freq_shift, toa_arr, N);
}

int oracle_fcch_fine(const char *variant, const float *iq, int nsamp,
                     int sps, float freq_shift, int *toa, float *freq_err)
{
	const struct gmr1_fcch_burst *ft = fcch_by_name(variant);
	struct osmo_cxvec bv;

	if (!ft)
		return -1;
	osmo_cxvec_init_from_data(&bv, (float complex *)iq, nsamp);
	return gmr1_fcch_fine(ft, &bv, sps, freq_shift, toa, freq_err);
}

int oracle_fcch_snr(const char *variant, const float *iq, int nsamp,
                    int sps, float freq_shift, float *snr)
{
	const struct gmr1_fcch_burst *ft = fcch_by_name(variant);
	struct osmo_cxvec bv;

	if (!ft)
		return -1;
	osmo_cxvec_init_from_data(&bv, (float complex *)iq, nsamp);
	return gmr1_fcch_snr(ft, &bv, sps, freq_shift, snr);
}

int oracle_dkab(const float *iq, int nsamp, int sps, float freq_shift,
                int p, int8_t *ebits, float *toa)
{
	struct osmo_cxvec bv;

	osmo_cxvec_init_from_data(&bv, (float complex *)iq, nsamp);
	return gmr1_dkab_demod(&bv, sps, freq_shift, p, (sbit_t *)ebits, toa);
}
