// Native I/O for isle-tpu: memory-mapped TDF parsing and buffered model
// writing. Plays the role of the reference's native I/O layer (mmap
// char-parser and buffered mmap writer with hand-rolled formatters,
// reference include/utils.h:96-487) for the TPU rebuild: the host side of
// the pipeline is single-core here, so parse speed directly gates
// end-to-end wall-clock.
//
// Exposed via a C ABI consumed from Python with ctypes (isle_tpu/native.py).
//
// Build: make -C native   (produces libisle_io.so)

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct MappedFile {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open_file(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) {
      ::close(fd);
      return false;
    }
    size = static_cast<size_t>(st.st_size);
    if (size == 0) {
      data = nullptr;
      return true;
    }
    void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) {
      ::close(fd);
      return false;
    }
    madvise(p, size, MADV_SEQUENTIAL);
    data = static_cast<const char*>(p);
    return true;
  }

  ~MappedFile() {
    if (data) munmap(const_cast<char*>(data), size);
    if (fd >= 0) ::close(fd);
  }
};

// Parse up to `cap` whitespace-separated non-negative integers starting at
// *pos; returns count parsed into out[0..n).
inline bool parse_u64(const char*& p, const char* end, uint64_t& out) {
  while (p < end && !isdigit(static_cast<unsigned char>(*p))) ++p;
  if (p >= end) return false;
  uint64_t v = 0;
  while (p < end && isdigit(static_cast<unsigned char>(*p))) {
    v = v * 10 + static_cast<uint64_t>(*p - '0');
    ++p;
  }
  out = v;
  return true;
}

}  // namespace

extern "C" {

// Count the number of `<doc> <word> <count>` triples in the file.
// Returns -1 on I/O error, -2 on token count not divisible by 3.
int64_t isle_count_entries(const char* path) {
  MappedFile f;
  if (!f.open_file(path)) return -1;
  const char* p = f.data;
  const char* end = f.data + f.size;
  int64_t tokens = 0;
  bool in_num = false;
  for (; p < end; ++p) {
    bool d = isdigit(static_cast<unsigned char>(*p));
    if (d && !in_num) ++tokens;
    in_num = d;
  }
  if (tokens % 3 != 0) return -2;
  return tokens / 3;
}

// Fill docs/words/counts (1-based ids preserved; caller rebases).
// Returns the number of triples written, or -1 on error.
int64_t isle_parse_tdf(const char* path, int64_t* docs, int64_t* words,
                       int64_t* counts, int64_t cap) {
  MappedFile f;
  if (!f.open_file(path)) return -1;
  const char* p = f.data;
  const char* end = f.data + f.size;
  int64_t n = 0;
  uint64_t a, b, c;
  while (n < cap) {
    if (!parse_u64(p, end, a)) break;
    if (!parse_u64(p, end, b)) return -1;  // truncated triple
    if (!parse_u64(p, end, c)) return -1;
    docs[n] = static_cast<int64_t>(a);
    words[n] = static_cast<int64_t>(b);
    counts[n] = static_cast<int64_t>(c);
    ++n;
  }
  return n;
}

// Write `<topic>\t<word>\t<weight>\n` for entries > 1e-8, topic-major,
// `base`-based ids, 10-decimal weights (reference sparse model format,
// src/denseMatrix.cpp:169-180). model is column-major (vocab x ntopics)
// i.e. model[w + v * t]. Returns bytes written or -1.
int64_t isle_write_sparse_model(const char* path, const float* model,
                                int64_t vocab, int64_t ntopics,
                                int32_t base) {
  FILE* f = fopen(path, "w");
  if (!f) return -1;
  // Large stdio buffer: one fwrite per ~4MB.
  static const size_t kBuf = 4u << 20;
  std::string buf;
  buf.reserve(kBuf + 256);
  char line[80];
  int64_t total = 0;
  for (int64_t t = 0; t < ntopics; ++t) {
    const float* col = model + t * vocab;
    for (int64_t w = 0; w < vocab; ++w) {
      float v = col[w];
      if (v > 1e-8f) {
        int len = snprintf(line, sizeof(line), "%lld\t%lld\t%.10f\n",
                           static_cast<long long>(t + base),
                           static_cast<long long>(w + base),
                           static_cast<double>(v));
        buf.append(line, static_cast<size_t>(len));
        if (buf.size() >= kBuf) {
          fwrite(buf.data(), 1, buf.size(), f);
          total += static_cast<int64_t>(buf.size());
          buf.clear();
        }
      }
    }
  }
  if (!buf.empty()) {
    fwrite(buf.data(), 1, buf.size(), f);
    total += static_cast<int64_t>(buf.size());
  }
  fclose(f);
  return total;
}

// Sort entries by (doc, word) keeping first occurrence of duplicates
// (the ingest sort/dedup, reference src/trainer.cpp:237-247, made
// deterministic). In-place on the three arrays; returns the deduplicated
// count, or -1 on allocation failure.
int64_t isle_sort_dedup_entries(int64_t* docs, int64_t* words,
                                int64_t* counts, int64_t n) {
  struct E {
    uint64_t key;
    uint32_t idx_hi;  // original index for stable keep-first semantics
    uint32_t idx_lo;
  };
  E* es = static_cast<E*>(malloc(sizeof(E) * static_cast<size_t>(n)));
  if (!es && n > 0) return -1;
  for (int64_t i = 0; i < n; ++i) {
    es[i].key = (static_cast<uint64_t>(docs[i]) << 32) |
                static_cast<uint32_t>(words[i]);
    uint64_t u = static_cast<uint64_t>(i);
    es[i].idx_hi = static_cast<uint32_t>(u >> 32);
    es[i].idx_lo = static_cast<uint32_t>(u);
  }
  std::sort(es, es + n, [](const E& a, const E& b) {
    if (a.key != b.key) return a.key < b.key;
    if (a.idx_hi != b.idx_hi) return a.idx_hi < b.idx_hi;
    return a.idx_lo < b.idx_lo;
  });
  // compact: keep the first occurrence (lowest original index) per key
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (i == 0 || es[i].key != es[i - 1].key) es[m++] = es[i];
  }
  // materialize outputs (counts gathered via original index from a copy,
  // since counts[] is also an output)
  int64_t* counts_copy =
      static_cast<int64_t*>(malloc(sizeof(int64_t) * static_cast<size_t>(n)));
  if (!counts_copy && n > 0) {
    free(es);
    return -1;
  }
  memcpy(counts_copy, counts, sizeof(int64_t) * static_cast<size_t>(n));
  for (int64_t i = 0; i < m; ++i) {
    uint64_t src =
        (static_cast<uint64_t>(es[i].idx_hi) << 32) | es[i].idx_lo;
    docs[i] = static_cast<int64_t>(es[i].key >> 32);
    words[i] = static_cast<int64_t>(es[i].key & 0xffffffffu);
    counts[i] = counts_copy[src];
  }
  free(counts_copy);
  free(es);
  return m;
}

// Permutation sorting int32 (seg_major, seg_minor) pairs — used for the
// word-major (CSR) ordering of already doc-sorted entries. perm must have
// room for n int64s. Returns 0, or -1 on allocation failure.
int64_t isle_order_by(const int32_t* major, const int32_t* minor,
                      int64_t* perm, int64_t n) {
  struct P {
    uint64_t key;
    uint32_t idx_hi, idx_lo;
  };
  P* ps = static_cast<P*>(malloc(sizeof(P) * static_cast<size_t>(n)));
  if (!ps && n > 0) return -1;
  for (int64_t i = 0; i < n; ++i) {
    ps[i].key = (static_cast<uint64_t>(static_cast<uint32_t>(major[i])) << 32) |
                static_cast<uint32_t>(minor[i]);
    uint64_t u = static_cast<uint64_t>(i);
    ps[i].idx_hi = static_cast<uint32_t>(u >> 32);
    ps[i].idx_lo = static_cast<uint32_t>(u);
  }
  std::sort(ps, ps + n, [](const P& a, const P& b) {
    if (a.key != b.key) return a.key < b.key;
    if (a.idx_hi != b.idx_hi) return a.idx_hi < b.idx_hi;
    return a.idx_lo < b.idx_lo;
  });
  for (int64_t i = 0; i < n; ++i)
    perm[i] = static_cast<int64_t>(
        (static_cast<uint64_t>(ps[i].idx_hi) << 32) | ps[i].idx_lo);
  free(ps);
  return 0;
}

}  // extern "C"
