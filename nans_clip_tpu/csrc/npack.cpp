// npack: memory-mapped record store + threaded JPEG decode for the data
// pipeline. Native replacement for the reference's external LMDB C library
// (training/data.py:49-56) and PIL JPEG decode (training/data.py:110-111):
// zero-copy mmap'd reads for many reader processes, binary-searched u64 key
// index, and a libjpeg-turbo decode pool that emits fixed-size RGB batches
// ready for the device.
//
// File layout (little-endian):
//   [0]  magic  "NSPK1\0\0\0"                (8 bytes)
//   [8]  u64 record count N
//   [16] u64 index offset
//   [24] record payloads (concatenated)
//   [index_offset] N * { u64 key, u64 offset, u64 length }, sorted by key
//
// Build: g++ -O3 -shared -fPIC npack.cpp -o libnpack.so -ljpeg -pthread

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <functional>
#include <thread>
#include <unistd.h>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

extern "C" {

struct IndexEntry {
  uint64_t key;
  uint64_t offset;
  uint64_t length;
};

struct NPack {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t count = 0;
  const IndexEntry* index = nullptr;
};

static const char kMagic[8] = {'N', 'S', 'P', 'K', '1', 0, 0, 0};

NPack* npack_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 24) { ::close(fd); return nullptr; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) { ::close(fd); return nullptr; }
  const uint8_t* b = static_cast<const uint8_t*>(base);
  if (memcmp(b, kMagic, 8) != 0) { munmap(base, st.st_size); ::close(fd); return nullptr; }
  auto* p = new NPack();
  p->fd = fd;
  p->base = b;
  p->size = st.st_size;
  memcpy(&p->count, b + 8, 8);
  uint64_t index_off;
  memcpy(&index_off, b + 16, 8);
  // Validate the header against the file size: a truncated copy still
  // carries the valid magic, and an index pointing past EOF would make
  // the first lookup dereference unmapped memory (the python fallback
  // raises cleanly for the same file). Also require 8-byte alignment of
  // the index (the writer pads) so IndexEntry loads are well-defined.
  const uint64_t isize = (uint64_t)st.st_size;
  if (index_off < 24 || index_off > isize || (index_off & 7) != 0 ||
      p->count > (isize - index_off) / sizeof(IndexEntry)) {
    munmap(base, st.st_size); ::close(fd); delete p; return nullptr;
  }
  p->index = reinterpret_cast<const IndexEntry*>(b + index_off);
  // Readahead the index eagerly; payload reads are random after shuffling,
  // so whole-file WILLNEED would just storm I/O and evict useful pages.
  madvise(const_cast<uint8_t*>(b) + (index_off & ~4095UL),
          isize - (index_off & ~4095UL), MADV_WILLNEED);
  madvise(const_cast<uint8_t*>(b), index_off & ~4095UL, MADV_RANDOM);
  return p;
}

void npack_close(NPack* p) {
  if (!p) return;
  munmap(const_cast<uint8_t*>(p->base), p->size);
  ::close(p->fd);
  delete p;
}

uint64_t npack_count(const NPack* p) { return p ? p->count : 0; }

// Binary search by key; returns 1 on hit and fills ptr/len (zero-copy).
int npack_get(const NPack* p, uint64_t key, const uint8_t** ptr, uint64_t* len) {
  if (!p) return 0;
  uint64_t lo = 0, hi = p->count;
  while (lo < hi) {
    uint64_t mid = (lo + hi) / 2;
    uint64_t k = p->index[mid].key;
    if (k == key) {
      *ptr = p->base + p->index[mid].offset;
      *len = p->index[mid].length;
      return 1;
    }
    if (k < key) lo = mid + 1; else hi = mid;
  }
  return 0;
}

// Positional access (cursor iteration analog).
int npack_get_at(const NPack* p, uint64_t i, uint64_t* key, const uint8_t** ptr,
                 uint64_t* len) {
  if (!p || i >= p->count) return 0;
  *key = p->index[i].key;
  *ptr = p->base + p->index[i].offset;
  *len = p->index[i].length;
  return 1;
}

// ---------------------------------------------------------------------------
// JPEG decode pool: decode + bilinear resize to out_h x out_w RGB uint8.
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode one JPEG into dst (out_h*out_w*3, RGB u8) with bilinear resize.
// Returns 1 on success.
static int decode_one(const uint8_t* data, size_t len, int out_h, int out_w,
                      uint8_t* dst) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  // declared BEFORE setjmp: a longjmp from the libjpeg error handler does
  // not unwind C++ destructors, so a vector constructed after setjmp would
  // leak its buffer on every corrupt JPEG; this one is destroyed on the
  // normal function exits either way
  std::vector<uint8_t> buf;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return 0; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  cinfo.out_color_space = JCS_RGB;
  // libjpeg DCT scaling: pick the smallest 1/1..1/8 scale still >= target.
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (int denom = 8; denom >= 1; --denom) {
    if ((int)(cinfo.image_width / denom) >= out_w &&
        (int)(cinfo.image_height / denom) >= out_h) {
      cinfo.scale_denom = denom;
      break;
    }
  }
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  buf.resize((size_t)w * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf.data() + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // Bilinear resize buf (h,w) -> dst (out_h,out_w).
  const float sy = (float)h / out_h, sx = (float)w / out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : (int)fy;
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int ox = 0; ox < out_w; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : (int)fx;
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = buf[((size_t)y0 * w + x0) * 3 + c];
        float v01 = buf[((size_t)y0 * w + x1) * 3 + c];
        float v10 = buf[((size_t)y1 * w + x0) * 3 + c];
        float v11 = buf[((size_t)y1 * w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[((size_t)oy * out_w + ox) * 3 + c] = (uint8_t)(v + 0.5f);
      }
    }
  }
  return 1;
}

// Shared decode-pool scaffold: run fn(i) for i in [0, n) over a thread
// pool (ONE copy — the four batch decode entry points below must not
// drift in their threading/cleanup behavior again). std::function, not a
// template: templates are illegal inside this extern "C" block, and the
// per-item indirection cost is noise next to a JPEG decode.
static void run_pool(int n, int num_threads,
                     const std::function<void(int)>& fn) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      fn(i);
    }
  };
  if (num_threads <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// PIL-exact bicubic resample (Pillow src/libImaging/Resample.c semantics):
// separable two-pass (horizontal first, uint8 intermediate), Keys a=-0.5
// kernel with support scaling on downscale (antialias), coefficients
// normalized in double then fixed-point INT32 at PRECISION_BITS, clip8
// rounding. Byte-identical to Image.resize((ow,oh), Image.BICUBIC) on RGB
// (verified exhaustively in tests/test_native_decode.py) — the serving
// daemon's fast path must feed the model the same pixels evaluation saw.
// ---------------------------------------------------------------------------

static const int kPrecisionBits = 32 - 8 - 2;

static inline uint8_t pil_clip8(int in) {
  if (in >= (1 << kPrecisionBits << 8)) return 255;
  if (in <= 0) return 0;
  return (uint8_t)(in >> kPrecisionBits);
}

static inline double bicubic_filter(double x) {
  const double a = -0.5;
  if (x < 0.0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1;
  if (x < 2.0) return (((x - 5) * x + 8) * x - 4) * a;
  return 0.0;
}

// Pillow precompute_coeffs for the full box [0, inSize): per output index,
// INT32 fixed-point kernel taps + (xmin, xmax) bounds. Returns ksize.
static int pil_coeffs(int in_size, int out_size, std::vector<int>* kk,
                      std::vector<int>* bounds) {
  const double support_base = 2.0;  // bicubic
  double scale = (double)in_size / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = support_base * filterscale;
  int ksize = (int)ceil(support) * 2 + 1;
  std::vector<double> prekk((size_t)out_size * ksize);
  kk->assign((size_t)out_size * ksize, 0);
  bounds->assign((size_t)out_size * 2, 0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &prekk[(size_t)xx * ksize];
    int x = 0;
    for (; x < xmax; ++x) {
      double w = bicubic_filter((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    for (x = 0; x < xmax; ++x)
      if (ww != 0.0) k[x] /= ww;
    for (; x < ksize; ++x) k[x] = 0;
    (*bounds)[xx * 2 + 0] = xmin;
    (*bounds)[xx * 2 + 1] = xmax;
  }
  for (size_t i = 0; i < prekk.size(); ++i)
    (*kk)[i] = (int)(prekk[i] < 0 ? -0.5 + prekk[i] * (1 << kPrecisionBits)
                                  : 0.5 + prekk[i] * (1 << kPrecisionBits));
  return ksize;
}

// src [h, w, 3] u8 -> dst [out_h, out_w, 3] u8, Pillow-bit-exact.
void npack_resize_bicubic(const uint8_t* src, int h, int w, uint8_t* dst,
                          int out_h, int out_w) {
  std::vector<int> kkx, bx, kky, by;
  int ksx = pil_coeffs(w, out_w, &kkx, &bx);
  int ksy = pil_coeffs(h, out_h, &kky, &by);
  // horizontal pass into a [h, out_w, 3] uint8 temp (Pillow quantizes the
  // intermediate through clip8 too — float temps would NOT be bit-exact)
  std::vector<uint8_t> tmp((size_t)h * out_w * 3);
  for (int yy = 0; yy < h; ++yy) {
    const uint8_t* row = src + (size_t)yy * w * 3;
    uint8_t* orow = tmp.data() + (size_t)yy * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      int xmin = bx[xx * 2], xmax = bx[xx * 2 + 1];
      const int* k = &kkx[(size_t)xx * ksx];
      int s0 = 1 << (kPrecisionBits - 1), s1 = s0, s2 = s0;
      for (int x = 0; x < xmax; ++x) {
        const uint8_t* p = row + (size_t)(x + xmin) * 3;
        s0 += p[0] * k[x];
        s1 += p[1] * k[x];
        s2 += p[2] * k[x];
      }
      orow[xx * 3 + 0] = pil_clip8(s0);
      orow[xx * 3 + 1] = pil_clip8(s1);
      orow[xx * 3 + 2] = pil_clip8(s2);
    }
  }
  for (int yy = 0; yy < out_h; ++yy) {
    int ymin = by[yy * 2], ymax = by[yy * 2 + 1];
    const int* k = &kky[(size_t)yy * ksy];
    uint8_t* orow = dst + (size_t)yy * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      int s0 = 1 << (kPrecisionBits - 1), s1 = s0, s2 = s0;
      for (int y = 0; y < ymax; ++y) {
        const uint8_t* p = tmp.data() + ((size_t)(y + ymin) * out_w + xx) * 3;
        s0 += p[0] * k[y];
        s1 += p[1] * k[y];
        s2 += p[2] * k[y];
      }
      orow[xx * 3 + 0] = pil_clip8(s0);
      orow[xx * 3 + 1] = pil_clip8(s1);
      orow[xx * 3 + 2] = pil_clip8(s2);
    }
  }
}

// Full (no DCT scaling) decode + PIL-exact bicubic resize — the eval/serving
// transform's semantics (utils/transform.py image_transform: resize BEFORE
// RGB conversion; for grayscale sources L-resize-then-replicate equals
// replicate-then-per-channel-resize, so decoding straight to RGB matches).
// Unusual color spaces (CMYK etc.) return 0 so callers fall back to PIL.
static int decode_one_pil(const uint8_t* data, size_t len, int out_h,
                          int out_w, uint8_t* dst, int dct_scale) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  std::vector<uint8_t> buf;  // before setjmp: see decode_one
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return 0; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (cinfo.jpeg_color_space != JCS_RGB &&
      cinfo.jpeg_color_space != JCS_YCbCr &&
      cinfo.jpeg_color_space != JCS_GRAYSCALE) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  cinfo.out_color_space = JCS_RGB;
  // decompression-bomb guard on the ORIGINAL claimed dimensions, checked
  // BEFORE any DCT scaling — Pillow raises DecompressionBombError at
  // open time for pixels > 2 * MAX_IMAGE_PIXELS(89478485) = 178,956,970,
  // so checking post-scale dims would accept (in dct_scale mode) images
  // the PIL path refuses
  if ((uint64_t)cinfo.image_width * (uint64_t)cinfo.image_height
      > 178956970ULL) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (dct_scale) {
    // PIL draft-mode analog: decode at the smallest 1/1..1/8 DCT scale
    // still >= the target — near-free downscale for large sources, NOT
    // bit-exact with the full-decode path (opt-in, tolerance documented
    // in tests/test_native_decode.py)
    cinfo.scale_num = 1;
    cinfo.scale_denom = 1;
    for (int denom = 8; denom >= 1; --denom) {
      if ((int)(cinfo.image_width / denom) >= out_w &&
          (int)(cinfo.image_height / denom) >= out_h) {
        cinfo.scale_denom = denom;
        break;
      }
    }
  }
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  if (w <= 0 || h <= 0) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  buf.resize((size_t)w * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf.data() + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // corrupt-data warnings (e.g. "Premature end of JPEG file") make libjpeg
  // pad missing scanlines instead of failing; PIL raises on those files, so
  // report failure and let the caller's strict PIL fallback decide
  const long warnings = cinfo.err->num_warnings;
  jpeg_destroy_decompress(&cinfo);
  if (warnings > 0) return 0;
  npack_resize_bicubic(buf.data(), h, w, dst, out_h, out_w);
  return 1;
}

// Batch decode+bicubic from raw buffers (the serving daemon's image path).
// dct_scale=0: bit-exact with the PIL eval transform; 1: draft-mode speed.
void npack_decode_jpeg_pil(const uint8_t** datas, const uint64_t* lens, int n,
                           int out_h, int out_w, int num_threads,
                           int dct_scale, uint8_t* out, uint8_t* ok) {
  run_pool(n, num_threads, [&](int i) {
    uint8_t* dst = out + (size_t)i * out_h * out_w * 3;
    ok[i] = decode_one_pil(datas[i], lens[i], out_h, out_w, dst, dct_scale);
    if (!ok[i]) memset(dst, 0, (size_t)out_h * out_w * 3);
  });
}

// Pack-keyed batch decode through the PIL-exact path (reads the mmap
// directly — no per-key Python copies). Missing keys: ok=0, zero image.
void npack_decode_jpeg_batch_pil(const NPack* p, const uint64_t* keys, int n,
                                 int out_h, int out_w, int num_threads,
                                 int dct_scale, uint8_t* out, uint8_t* ok) {
  run_pool(n, num_threads, [&](int i) {
    const uint8_t* ptr;
    uint64_t len;
    uint8_t* dst = out + (size_t)i * out_h * out_w * 3;
    if (npack_get(p, keys[i], &ptr, &len)) {
      ok[i] = decode_one_pil(ptr, len, out_h, out_w, dst, dct_scale);
    } else {
      ok[i] = 0;
    }
    if (!ok[i]) memset(dst, 0, (size_t)out_h * out_w * 3);
  });
}

// Decode a batch in parallel. offsets/lengths index into the pack's mmap by
// key. out: [n, out_h, out_w, 3] u8. ok: [n] u8 success flags.
void npack_decode_jpeg_batch(const NPack* p, const uint64_t* keys, int n,
                             int out_h, int out_w, int num_threads,
                             uint8_t* out, uint8_t* ok) {
  run_pool(n, num_threads, [&](int i) {
    const uint8_t* ptr;
    uint64_t len;
    uint8_t* dst = out + (size_t)i * out_h * out_w * 3;
    if (npack_get(p, keys[i], &ptr, &len)) {
      ok[i] = decode_one(ptr, len, out_h, out_w, dst);
    } else {
      ok[i] = 0;
    }
    if (!ok[i]) memset(dst, 0, (size_t)out_h * out_w * 3);
  });
}

// Standalone (non-pack) batch decode from raw buffers.
void npack_decode_jpeg_raw(const uint8_t** datas, const uint64_t* lens, int n,
                           int out_h, int out_w, int num_threads,
                           uint8_t* out, uint8_t* ok) {
  run_pool(n, num_threads, [&](int i) {
    uint8_t* dst = out + (size_t)i * out_h * out_w * 3;
    ok[i] = decode_one(datas[i], lens[i], out_h, out_w, dst);
    if (!ok[i]) memset(dst, 0, (size_t)out_h * out_w * 3);
  });
}

}  // extern "C"
