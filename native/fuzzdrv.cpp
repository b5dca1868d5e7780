// fuzzdrv.cpp — sanitizer fuzz driver for the native WSI readers.
//
// The readers parse untrusted scanner output, so memory safety is part of
// the production contract.  This driver exercises one slide end to end —
// open, metadata, clipped region reads (including deliberately
// out-of-bounds windows), bounded whole-level reads, raw-tile access —
// and is built with -fsanitize=address,undefined (native/Makefile `fuzz`
// target).  tests/test_native_sanitize.py runs it over the synthetic
// fixture corpus (every format/compression the readers support) and over
// seeded random byte-mutations of those fixtures: a graceful failure
// (named error, nonzero exit) is fine; a sanitizer report is a bug.
//
// The reference gets this property from OpenSlide's fuzz-hardened C
// (oss-fuzz); this is the TPU build's equivalent evidence.

#include <execinfo.h>
#include <unistd.h>

#include <csignal>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <exception>
#include <vector>

extern "C" {
void* wsi_open(const char* path);
void wsi_close(void* h);
const char* wsi_last_error();
int64_t wsi_width(void* h);
int64_t wsi_height(void* h);
int32_t wsi_level_count(void* h);
int64_t wsi_level_width(void* h, int32_t level);
int64_t wsi_level_height(void* h, int32_t level);
const char* wsi_description(void* h);
double wsi_mpp(void* h);
int32_t wsi_compression(void* h);
int32_t wsi_raw_only(void* h);
int64_t wsi_decode_errors(void* h);
int32_t wsi_tile_width(void* h, int32_t level);
int32_t wsi_tile_height(void* h, int32_t level);
int64_t wsi_read_raw_tile(void* h, int32_t level, int64_t x, int64_t y,
                          void* buf, int64_t bufsize);
int32_t wsi_read_region(void* h, int64_t x, int64_t y, int64_t w, int64_t h_,
                        void* out);
int32_t wsi_read_level(void* h, int32_t level, void* out);
}

namespace {

// Mutated headers can claim absurd dimensions; bound every allocation the
// *driver* makes (the readers bound their own).
constexpr int64_t kMaxLevelPx = int64_t(16) << 20;  // 16 Mpx whole-level cap
constexpr int64_t kWin = 256;                       // region window size

int drive(const char* path) {
  void* h = wsi_open(path);
  if (!h) {
    std::printf("open failed (graceful): %s\n", wsi_last_error());
    return 1;
  }
  const int64_t w = wsi_width(h), ht = wsi_height(h);
  std::printf("dims %lld x %lld mpp %.4f levels %d desc %.60s\n",
              (long long)w, (long long)ht, wsi_mpp(h), wsi_level_count(h),
              wsi_description(h));

  std::vector<uint8_t> win((size_t)(kWin * kWin * 4));
  // corners, center, and windows straddling every edge (negative and
  // beyond-extent coordinates must clip, not crash)
  const int64_t xs[] = {0, w - kWin, w / 2, -kWin / 2, w - kWin / 2, 0};
  const int64_t ys[] = {0, ht - kWin, ht / 2, -kWin / 2, ht - kWin / 2, -7};
  for (size_t i = 0; i < sizeof(xs) / sizeof(xs[0]); ++i) {
    std::fprintf(stderr, "[drv] region %zu\n", i);
    (void)wsi_read_region(h, xs[i], ys[i], kWin, kWin, win.data());
  }

  const int32_t levels = wsi_level_count(h);
  for (int32_t l = 0; l < levels && l < 16; ++l) {
    const int64_t lw = wsi_level_width(h, l), lh = wsi_level_height(h, l);
    if (lw <= 0 || lh <= 0 || lw * lh > kMaxLevelPx) continue;
    std::fprintf(stderr, "[drv] level %d (%lld x %lld)\n", l, (long long)lw,
                 (long long)lh);
    std::vector<uint8_t> buf((size_t)(lw * lh * 4));
    (void)wsi_read_level(h, l, buf.data());
  }

  if (wsi_raw_only(h)) {
    const int32_t tw = wsi_tile_width(h, 0), th = wsi_tile_height(h, 0);
    if (tw > 0 && th > 0 && (int64_t)tw * th <= kMaxLevelPx) {
      std::vector<uint8_t> raw((size_t)8 << 20);
      (void)wsi_read_raw_tile(h, 0, 0, 0, raw.data(), (int64_t)raw.size());
    }
  }

  std::printf("decode_errors %lld\n", (long long)wsi_decode_errors(h));
  wsi_close(h);
  return 0;
}

}  // namespace

// WSIFUZZ_ALARM_S: abort with a backtrace if one slide takes longer than
// this many seconds — turns "the test timed out somewhere" into a stack.
void alarm_backtrace(int) {
  void* frames[32];
  const int n = backtrace(frames, 32);
  backtrace_symbols_fd(frames, n, 2);
  _exit(66);
}

int main(int argc, char** argv) {
  if (argc != 2) {
    std::fprintf(stderr, "usage: wsifuzz <slide>\n");
    return 64;
  }
  if (const char* a = std::getenv("WSIFUZZ_ALARM_S")) {
    std::signal(SIGALRM, alarm_backtrace);
    alarm((unsigned)std::atoi(a));
  }
  try {
    return drive(argv[1]);
  } catch (const std::bad_alloc&) {
    std::printf("bad_alloc (graceful)\n");
    return 2;
  } catch (const std::exception& e) {
    std::printf("exception (graceful): %s\n", e.what());
    return 3;
  }
}
