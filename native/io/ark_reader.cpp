// Native Kaldi-ark reader: the host-side data-loader fast path.
//
// The reference's loaders parse ark archives in pure Python
// (trainer_3m_fix/loader/kaldi_io.py, 666 lines incl. subprocess
// plumbing); at TPU training throughput the per-matrix Python
// struct-unpack loop becomes the bottleneck, so the hot format —
// binary float32 matrices ("\0BFM ") — is parsed here with buffered
// stdio and a single fread per matrix. Anything else (compressed
// matrices, text arks) returns UNSUPPORTED and the Python reader
// takes over (m3asr_tpu/io/kaldi_io.py keeps full format coverage).
//
// C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

namespace {

struct ArkReader {
  FILE* f = nullptr;
  int64_t rows = 0;
  int64_t cols = 0;
  bool header_pending = false;  // header parsed, data not yet consumed
};

constexpr int OK = 1;
constexpr int END = 0;
constexpr int UNSUPPORTED = -1;
constexpr int CORRUPT = -2;

bool read_int32_tagged(FILE* f, int32_t* out) {
  // Kaldi binary ints are "\x04" + 4 LE bytes
  int c = fgetc(f);
  if (c != 4) return false;
  return fread(out, 4, 1, f) == 1;
}

}  // namespace

extern "C" {

void* ark_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* r = new ArkReader();
  r->f = f;
  return r;
}

void ark_close(void* handle) {
  auto* r = static_cast<ArkReader*>(handle);
  if (!r) return;
  if (r->f) fclose(r->f);
  delete r;
}

// Parses the next "key \0BFM <rows> <cols>" header. Returns OK with
// key/rows/cols filled, END at EOF, UNSUPPORTED on a non-BFM entry
// (caller falls back to the Python reader), CORRUPT on malformed data.
int ark_next_header(void* handle, char* key_buf, int key_cap,
                    int64_t* rows, int64_t* cols) {
  auto* r = static_cast<ArkReader*>(handle);
  if (!r || !r->f || r->header_pending) return CORRUPT;

  // key: bytes until ' '
  int n = 0;
  int c = fgetc(r->f);
  if (c == EOF) return END;
  while (c != ' ' && c != EOF) {
    if (n + 1 >= key_cap) return CORRUPT;
    key_buf[n++] = static_cast<char>(c);
    c = fgetc(r->f);
  }
  if (c == EOF || n == 0) return CORRUPT;
  key_buf[n] = '\0';

  // "\0B" binary marker + "FM " token
  char marker[2];
  if (fread(marker, 1, 2, r->f) != 2) return CORRUPT;
  if (marker[0] != '\0' || marker[1] != 'B') return UNSUPPORTED;
  char token[4] = {0};
  if (fread(token, 1, 3, r->f) != 3) return CORRUPT;
  if (std::strncmp(token, "FM ", 3) != 0) return UNSUPPORTED;

  int32_t nr = 0, nc = 0;
  if (!read_int32_tagged(r->f, &nr) || !read_int32_tagged(r->f, &nc))
    return CORRUPT;
  if (nr < 0 || nc <= 0) return CORRUPT;
  r->rows = nr;
  r->cols = nc;
  r->header_pending = true;
  *rows = nr;
  *cols = nc;
  return OK;
}

// Reads the pending matrix into out (rows*cols float32, row-major).
int ark_read_data(void* handle, float* out) {
  auto* r = static_cast<ArkReader*>(handle);
  if (!r || !r->header_pending) return CORRUPT;
  size_t want = static_cast<size_t>(r->rows) * r->cols;
  if (fread(out, sizeof(float), want, r->f) != want) return CORRUPT;
  r->header_pending = false;
  return OK;
}

// Skips the pending matrix (scp-style selective reads).
int ark_skip(void* handle) {
  auto* r = static_cast<ArkReader*>(handle);
  if (!r || !r->header_pending) return CORRUPT;
  int64_t bytes = r->rows * r->cols * static_cast<int64_t>(sizeof(float));
  if (fseek(r->f, bytes, SEEK_CUR) != 0) return CORRUPT;
  r->header_pending = false;
  return OK;
}

}  // extern "C"
