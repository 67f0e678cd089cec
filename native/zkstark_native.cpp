// zkstark_native — native runtime components for the TPU STARK framework.
//
// Host-side hot paths that Python cannot do at production rate: batched
// Merkle leaf hashing (decimal-string encoding of 128-bit field elements +
// BLAKE2b-512, ref encoding: /root/reference/src/field/field_element.rs:46-50
// via merkle_root.rs:21-32) and full Merkle layer construction, threaded
// across cores.  Exposed via the CPython C API (no pybind11 in this image).
//
// BLAKE2b implementation follows RFC 7693 (public domain reference design).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <functional>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// BLAKE2b-512 (RFC 7693)
// ---------------------------------------------------------------------------

struct Blake2bState {
  uint64_t h[8];
  uint64_t t[2];
  uint8_t buf[128];
  size_t buflen;
};

static const uint64_t kIV[8] = {
    0x6a09e667f3bcc908ULL, 0xbb67ae8584caa73bULL, 0x3c6ef372fe94f82bULL,
    0xa54ff53a5f1d36f1ULL, 0x510e527fade682d1ULL, 0x9b05688c2b3e6c1fULL,
    0x1f83d9abfb41bd6bULL, 0x5be0cd19137e2179ULL};

static const uint8_t kSigma[12][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3}};

static inline uint64_t rotr64(uint64_t x, int n) {
  return (x >> n) | (x << (64 - n));
}

static void blake2b_compress(Blake2bState* s, const uint8_t block[128],
                             bool last) {
  uint64_t m[16];
  uint64_t v[16];
  for (int i = 0; i < 16; i++) std::memcpy(&m[i], block + 8 * i, 8);
  for (int i = 0; i < 8; i++) v[i] = s->h[i];
  for (int i = 0; i < 8; i++) v[i + 8] = kIV[i];
  v[12] ^= s->t[0];
  v[13] ^= s->t[1];
  if (last) v[14] = ~v[14];

#define G(a, b, c, d, x, y)          \
  do {                               \
    v[a] = v[a] + v[b] + (x);        \
    v[d] = rotr64(v[d] ^ v[a], 32);  \
    v[c] = v[c] + v[d];              \
    v[b] = rotr64(v[b] ^ v[c], 24);  \
    v[a] = v[a] + v[b] + (y);        \
    v[d] = rotr64(v[d] ^ v[a], 16);  \
    v[c] = v[c] + v[d];              \
    v[b] = rotr64(v[b] ^ v[c], 63);  \
  } while (0)

  for (int r = 0; r < 12; r++) {
    const uint8_t* sg = kSigma[r];
    G(0, 4, 8, 12, m[sg[0]], m[sg[1]]);
    G(1, 5, 9, 13, m[sg[2]], m[sg[3]]);
    G(2, 6, 10, 14, m[sg[4]], m[sg[5]]);
    G(3, 7, 11, 15, m[sg[6]], m[sg[7]]);
    G(0, 5, 10, 15, m[sg[8]], m[sg[9]]);
    G(1, 6, 11, 12, m[sg[10]], m[sg[11]]);
    G(2, 7, 8, 13, m[sg[12]], m[sg[13]]);
    G(3, 4, 9, 14, m[sg[14]], m[sg[15]]);
  }
#undef G

  for (int i = 0; i < 8; i++) s->h[i] ^= v[i] ^ v[i + 8];
}

static void blake2b_init(Blake2bState* s) {
  std::memset(s, 0, sizeof(*s));
  for (int i = 0; i < 8; i++) s->h[i] = kIV[i];
  s->h[0] ^= 0x01010000ULL ^ 64ULL;  // digest_length=64, fanout=1, depth=1
}

static void blake2b_update(Blake2bState* s, const uint8_t* in, size_t len) {
  while (len > 0) {
    if (s->buflen == 128) {
      s->t[0] += 128;
      if (s->t[0] < 128) s->t[1]++;
      blake2b_compress(s, s->buf, false);
      s->buflen = 0;
    }
    size_t take = 128 - s->buflen;
    if (take > len) take = len;
    std::memcpy(s->buf + s->buflen, in, take);
    s->buflen += take;
    in += take;
    len -= take;
  }
}

static void blake2b_final(Blake2bState* s, uint8_t out[64]) {
  s->t[0] += s->buflen;
  if (s->t[0] < s->buflen) s->t[1]++;
  std::memset(s->buf + s->buflen, 0, 128 - s->buflen);
  blake2b_compress(s, s->buf, true);
  for (int i = 0; i < 8; i++) std::memcpy(out + 8 * i, &s->h[i], 8);
}

static void blake2b512(const uint8_t* in, size_t len, uint8_t out[64]) {
  Blake2bState s;
  blake2b_init(&s);
  blake2b_update(&s, in, len);
  blake2b_final(&s, out);
}

// ---------------------------------------------------------------------------
// u128 decimal encoding (the protocol's Merkle leaf encoding)
// ---------------------------------------------------------------------------

using u128 = unsigned __int128;

// Writes the decimal string of v into buf (at least 40 bytes); returns length.
static size_t u128_to_decimal(u128 v, char* buf) {
  char tmp[40];
  size_t n = 0;
  if (v == 0) {
    buf[0] = '0';
    return 1;
  }
  while (v > 0) {
    tmp[n++] = static_cast<char>('0' + static_cast<unsigned>(v % 10));
    v /= 10;
  }
  for (size_t i = 0; i < n; i++) buf[i] = tmp[n - 1 - i];
  return n;
}

static void run_threads(size_t count, size_t grain,
                        const std::function<void(size_t, size_t)>& fn) {
  size_t hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  size_t n_threads = count / grain;
  if (n_threads > hw) n_threads = hw;
  if (n_threads <= 1) {
    fn(0, count);
    return;
  }
  std::vector<std::thread> threads;
  size_t chunk = (count + n_threads - 1) / n_threads;
  for (size_t t = 0; t < n_threads; t++) {
    size_t lo = t * chunk;
    size_t hi = lo + chunk < count ? lo + chunk : count;
    if (lo >= hi) break;
    threads.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// Python bindings
// ---------------------------------------------------------------------------

// merkle_layers(limbs: buffer of uint32[n*8] little-endian 16-bit limbs)
//   -> bytes: concatenated tree layers bottom-up, each node 64 bytes.
// Layer 0 holds blake2b512(decimal(value)) per leaf; layer L+1 hashes
// adjacent pairs.  n must be a power of two.
static PyObject* py_merkle_layers(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  if (view.len % (8 * 4) != 0) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "buffer must be n*8 uint32 limbs");
    return nullptr;
  }
  size_t n = static_cast<size_t>(view.len) / 32;
  if (n == 0 || (n & (n - 1)) != 0) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "leaf count must be a power of two");
    return nullptr;
  }
  const uint32_t* limbs = static_cast<const uint32_t*>(view.buf);

  size_t total_nodes = 2 * n - 1;
  PyObject* out = nullptr;
  std::vector<uint8_t> nodes(total_nodes * 64);

  Py_BEGIN_ALLOW_THREADS;
  // layer 0: leaf hashes of decimal strings
  run_threads(n, 1024, [&](size_t lo, size_t hi) {
    char dec[48];
    for (size_t i = lo; i < hi; i++) {
      u128 v = 0;
      for (int k = 7; k >= 0; k--) {
        v = (v << 16) | static_cast<u128>(limbs[i * 8 + k] & 0xFFFFu);
      }
      size_t len = u128_to_decimal(v, dec);
      blake2b512(reinterpret_cast<const uint8_t*>(dec), len,
                 nodes.data() + i * 64);
    }
  });
  // upper layers
  size_t src_off = 0;
  size_t level_n = n;
  while (level_n > 1) {
    size_t dst_off = src_off + level_n * 64;
    size_t half = level_n / 2;
    const uint8_t* src = nodes.data() + src_off;
    uint8_t* dst = nodes.data() + dst_off;
    run_threads(half, 2048, [&, src, dst](size_t lo, size_t hi) {
      for (size_t i = lo; i < hi; i++) {
        blake2b512(src + i * 128, 128, dst + i * 64);
      }
    });
    src_off = dst_off;
    level_n = half;
  }
  Py_END_ALLOW_THREADS;

  out = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(nodes.data()),
      static_cast<Py_ssize_t>(nodes.size()));
  PyBuffer_Release(&view);
  return out;
}

// blake2b512(data: bytes) -> bytes (for parity testing)
static PyObject* py_blake2b512(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  uint8_t out[64];
  blake2b512(static_cast<const uint8_t*>(view.buf),
             static_cast<size_t>(view.len), out);
  PyBuffer_Release(&view);
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out), 64);
}

// decimal_leaves(limbs) -> bytes of newline-joined decimal strings (debug)
static PyObject* py_decimals(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  size_t n = static_cast<size_t>(view.len) / 32;
  const uint32_t* limbs = static_cast<const uint32_t*>(view.buf);
  std::string s;
  char dec[48];
  for (size_t i = 0; i < n; i++) {
    u128 v = 0;
    for (int k = 7; k >= 0; k--)
      v = (v << 16) | static_cast<u128>(limbs[i * 8 + k] & 0xFFFFu);
    size_t len = u128_to_decimal(v, dec);
    s.append(dec, len);
    if (i + 1 < n) s.push_back('\n');
  }
  PyBuffer_Release(&view);
  return PyBytes_FromStringAndSize(s.data(),
                                   static_cast<Py_ssize_t>(s.size()));
}

static PyMethodDef kMethods[] = {
    {"merkle_layers", py_merkle_layers, METH_VARARGS,
     "Build all Merkle layers from uint32 limb buffer."},
    {"blake2b512", py_blake2b512, METH_VARARGS, "BLAKE2b-512 digest."},
    {"decimals", py_decimals, METH_VARARGS,
     "Decimal encodings of limb values."},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "zkstark_native",
                                     "Native STARK runtime components", -1,
                                     kMethods};

}  // namespace

extern "C" PyMODINIT_FUNC PyInit_zkstark_native(void) {
  return PyModule_Create(&kModule);
}
