// gmr1_tpu native runtime components.
//
// C++ implementations of the host-side hot paths around the TPU compute
// kernels (the reference's runtime is C throughout; these are the
// pieces that stay on the host in the TPU-native design):
//
//   * A5/1 keystream generation (reference src/l1/a5.c semantics) —
//     called once per burst per channel in the receiver FSMs.
//   * GSMTap v2 UDP emission (reference src/gsmtap.c) — the
//     machine-readable output contract, potentially thousands of
//     frames/s for a full transponder.
//   * burst energy measurement (reference src/gmr1_rx.c:172-182).
//
// Exposed with a plain C ABI for ctypes binding (no pybind11 in the
// image).  Build: make -C gmr1_tpu/native

#include <cstdint>
#include <cstring>

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------
// A5/1 (GMR-1 variant, 4 LFSRs, majority clocking)
// ---------------------------------------------------------------------

static const uint32_t kMask[4] = {(1u << 19) - 1, (1u << 22) - 1,
                                  (1u << 23) - 1, (1u << 17) - 1};
static const uint32_t kTaps[4] = {0x072000, 0x311000, 0x660000, 0x013100};
static const int kR4Cb[3] = {15, 6, 1};
static const int kOutMaj[3][3] = {{1, 6, 15}, {3, 8, 14}, {4, 15, 19}};
static const int kOutXor[3] = {11, 1, 0};

static inline uint32_t parity32(uint32_t x) {
  x ^= x >> 16; x ^= x >> 8; x ^= x >> 4; x ^= x >> 2; x ^= x >> 1;
  return x & 1;
}

struct A5State { uint32_t r[4]; };

static inline void clock_one(A5State &s, int i) {
  s.r[i] = ((s.r[i] << 1) & kMask[i]) | parity32(s.r[i] & kTaps[i]);
}

static inline void clock_all(A5State &s) {
  int cb[3], m;
  for (int i = 0; i < 3; i++) cb[i] = (s.r[3] >> kR4Cb[i]) & 1;
  m = (cb[0] + cb[1] + cb[2]) >= 2;
  for (int i = 0; i < 3; i++)
    if (cb[i] == m) clock_one(s, i);
  clock_one(s, 3);
}

static inline uint8_t a5_output(const A5State &s) {
  uint32_t v = 0;
  for (int i = 0; i < 3; i++) {
    uint32_t maj = (((s.r[i] >> kOutMaj[i][0]) & 1) +
                    ((s.r[i] >> kOutMaj[i][1]) & 1) +
                    ((s.r[i] >> kOutMaj[i][2]) & 1)) >= 2;
    v ^= maj ^ ((s.r[i] >> kOutXor[i]) & 1);
  }
  return (uint8_t)v;
}

void gmr1_a5_keystream(const uint8_t *key, uint32_t fn, int nbits,
                       uint8_t *dl, uint8_t *ul) {
  // key schedule: byte swap + fn mixing (a5.c:233-241)
  uint8_t lkey[8];
  static const int swap[8] = {1, 0, 3, 2, 5, 4, 7, 6};
  for (int i = 0; i < 8; i++) lkey[i] = key[swap[i]];
  lkey[6] ^= (fn & 0x0000F) << 4;
  lkey[3] ^= (fn & 0x00030) << 2;
  lkey[1] ^= (fn & 0x007C0) >> 3;
  lkey[0] ^= (fn & 0x0F800) >> 11;
  lkey[0] ^= (fn & 0x70000) >> 11;

  A5State s = {{0, 0, 0, 0}};
  for (int i = 0; i < 64; i++) {
    uint32_t b = (lkey[i >> 3] >> (7 - (i & 7))) & 1;
    for (int j = 0; j < 4; j++) clock_one(s, j);
    for (int j = 0; j < 4; j++) s.r[j] ^= b;
  }
  for (int j = 0; j < 4; j++) s.r[j] |= 1;
  for (int i = 0; i < 250; i++) clock_all(s);

  for (int i = 0; i < nbits; i++) { clock_all(s); if (dl) dl[i] = a5_output(s); }
  for (int i = 0; i < nbits; i++) { clock_all(s); if (ul) ul[i] = a5_output(s); }
}

// batched variant: many frame numbers, one key
void gmr1_a5_keystream_batch(const uint8_t *key, const uint32_t *fns,
                             int n_fn, int nbits, uint8_t *dl) {
  for (int i = 0; i < n_fn; i++)
    gmr1_a5_keystream(key, fns[i], nbits, dl + (size_t)i * nbits, nullptr);
}

// ---------------------------------------------------------------------
// GSMTap v2 UDP emitter (gsmtap.c:44-71 field layout)
// ---------------------------------------------------------------------

int gmr1_gsmtap_open(const char *host, int port) {
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  sockaddr_in addr;
  std::memset(&addr, 0, sizeof(addr));
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) { close(fd); return -1; }
  if (connect(fd, (sockaddr *)&addr, sizeof(addr)) < 0) { close(fd); return -1; }
  return fd;
}

int gmr1_gsmtap_send(int fd, uint8_t chan_type, uint32_t fn, uint8_t tn,
                     const uint8_t *l2, int len) {
  uint8_t pkt[16 + 4096];
  if (len < 0 || len > 4096) return -1;
  std::memset(pkt, 0, 16);
  pkt[0] = 2;                    // version
  pkt[1] = 4;                    // hdr_len (32-bit words)
  pkt[2] = 0x0A;                 // GSMTAP_TYPE_GMR1_UM
  pkt[3] = tn;                   // timeslot
  uint32_t fn_be = htonl(fn);
  std::memcpy(pkt + 8, &fn_be, 4);
  pkt[12] = chan_type;
  std::memcpy(pkt + 16, l2, (size_t)len);
  return (int)send(fd, pkt, 16 + (size_t)len, 0) == 16 + len ? 0 : -1;
}

void gmr1_gsmtap_close(int fd) { close(fd); }

// ---------------------------------------------------------------------
// burst energy (gmr1_rx.c:172-182): mean |x|^2 excluding n>>5 borders
// ---------------------------------------------------------------------

float gmr1_burst_energy(const float *iq, long n) {
  long b = n >> 5;
  double e = 0.0;
  for (long i = b; i < n - b; i++)
    e += (double)iq[2 * i] * iq[2 * i] + (double)iq[2 * i + 1] * iq[2 * i + 1];
  return (float)(e / (double)n);
}

}  // extern "C"
