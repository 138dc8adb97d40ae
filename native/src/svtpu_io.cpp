// svtpu_io — native data-plane for the svtpu framework.
//
// Fills the role decord/PyAV/ffmpeg-subprocess play in the reference
// (third-party native decoders; SURVEY.md §2.9) with first-party code:
//   * sequential H.264/any-codec video reader (libavformat/libavcodec,
//     RGB24 via libswscale), C ABI for ctypes
//   * multi-threaded JPEG batch decoder (libjpeg) with fused bilinear
//     resize straight into a caller-provided contiguous uint8 NHWC buffer —
//     the host-side producer feeding device batches.
//
// Build: see native/Makefile (g++ -O3 -fPIC, links avformat avcodec avutil
// swscale jpeg pthread).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
#include <jpeglib.h>
}

// ---------------------------------------------------------------- video

struct VideoReader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwsContext* sws = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int stream_idx = -1;
  int w = 0, h = 0;
  bool eof_sent = false;
};

extern "C" void* svtpu_vr_open(const char* path, int* w, int* h,
                               int* nframes, double* fps) {
  auto* vr = new VideoReader();
  if (avformat_open_input(&vr->fmt, path, nullptr, nullptr) < 0) {
    delete vr;
    return nullptr;
  }
  if (avformat_find_stream_info(vr->fmt, nullptr) < 0) goto fail;
  vr->stream_idx = av_find_best_stream(vr->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                       nullptr, 0);
  if (vr->stream_idx < 0) goto fail;
  {
    AVStream* st = vr->fmt->streams[vr->stream_idx];
    const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!codec) goto fail;
    vr->dec = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(vr->dec, st->codecpar);
    vr->dec->thread_count = 0;  // auto
    if (avcodec_open2(vr->dec, codec, nullptr) < 0) goto fail;
    vr->w = vr->dec->width;
    vr->h = vr->dec->height;
    if (w) *w = vr->w;
    if (h) *h = vr->h;
    if (nframes) *nframes = (int)st->nb_frames;
    if (fps) {
      AVRational r = st->avg_frame_rate;
      *fps = r.den ? (double)r.num / r.den : 0.0;
    }
  }
  vr->pkt = av_packet_alloc();
  vr->frame = av_frame_alloc();
  return vr;
fail:
  if (vr->dec) avcodec_free_context(&vr->dec);
  if (vr->fmt) avformat_close_input(&vr->fmt);
  delete vr;
  return nullptr;
}

// Returns 1 and fills out[h*w*3] (RGB24) on success, 0 on EOF, <0 on error.
extern "C" int svtpu_vr_next(void* handle, uint8_t* out) {
  auto* vr = static_cast<VideoReader*>(handle);
  for (;;) {
    int r = avcodec_receive_frame(vr->dec, vr->frame);
    if (r == 0) {
      if (!vr->sws) {
        vr->sws = sws_getContext(
            vr->w, vr->h, (AVPixelFormat)vr->frame->format, vr->w, vr->h,
            AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr, nullptr);
        if (!vr->sws) return -2;
      }
      uint8_t* dst[1] = {out};
      int dst_stride[1] = {3 * vr->w};
      sws_scale(vr->sws, vr->frame->data, vr->frame->linesize, 0, vr->h,
                dst, dst_stride);
      av_frame_unref(vr->frame);
      return 1;
    }
    if (r == AVERROR_EOF) return 0;
    if (r != AVERROR(EAGAIN)) return -1;
    // Need more input.
    if (vr->eof_sent) return 0;
    r = av_read_frame(vr->fmt, vr->pkt);
    if (r < 0) {
      avcodec_send_packet(vr->dec, nullptr);  // flush
      vr->eof_sent = true;
      continue;
    }
    if (vr->pkt->stream_index == vr->stream_idx) {
      avcodec_send_packet(vr->dec, vr->pkt);
    }
    av_packet_unref(vr->pkt);
  }
}

// Read up to max_frames sequential frames into out[max_frames, h, w, 3].
// Returns the number of frames produced (0 at EOF, <0 on error). Amortizes
// the per-call FFI overhead for batch consumers.
extern "C" int svtpu_vr_read_batch(void* handle, uint8_t* out,
                                   int max_frames) {
  auto* vr = static_cast<VideoReader*>(handle);
  const size_t frame_bytes = (size_t)vr->w * vr->h * 3;
  int n = 0;
  while (n < max_frames) {
    int r = svtpu_vr_next(handle, out + (size_t)n * frame_bytes);
    if (r < 0) return r;
    if (r == 0) break;
    ++n;
  }
  return n;
}

extern "C" void svtpu_vr_close(void* handle) {
  auto* vr = static_cast<VideoReader*>(handle);
  if (!vr) return;
  if (vr->sws) sws_freeContext(vr->sws);
  if (vr->frame) av_frame_free(&vr->frame);
  if (vr->pkt) av_packet_free(&vr->pkt);
  if (vr->dec) avcodec_free_context(&vr->dec);
  if (vr->fmt) avformat_close_input(&vr->fmt);
  delete vr;
}

// ---------------------------------------------------------------- jpeg

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Bilinear resize HWC uint8 (src_h, src_w) -> (dst_h, dst_w), 3 channels.
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int dh, int dw) {
  if (sh == dh && sw == dw) {
    std::memcpy(dst, src, (size_t)sh * sw * 3);
    return;
  }
  const float ys = (float)sh / dh, xs = (float)sw / dw;
  for (int y = 0; y < dh; ++y) {
    // align_corners=False convention (matches PIL/torchvision bilinear).
    float fy = (y + 0.5f) * ys - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = (int)fy;
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * xs - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = (int)fx;
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - x0;
      const uint8_t* p00 = src + ((size_t)y0 * sw + x0) * 3;
      const uint8_t* p01 = src + ((size_t)y0 * sw + x1) * 3;
      const uint8_t* p10 = src + ((size_t)y1 * sw + x0) * 3;
      const uint8_t* p11 = src + ((size_t)y1 * sw + x1) * 3;
      uint8_t* o = dst + ((size_t)y * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + wx * (p01[c] - p00[c]);
        float bot = p10[c] + wx * (p11[c] - p10[c]);
        float v = top + wy * (bot - top);
        o[c] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

// Decode one JPEG file into dst (dst_h, dst_w, 3). Returns 0 on success.
int decode_one(const char* path, uint8_t* dst, int dh, int dw,
               std::vector<uint8_t>& scratch) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // DCT-domain downscale to the nearest scale >= target (cheap 8/N scaling).
  while (cinfo.scale_denom < 8 &&
         (int)(cinfo.image_width * cinfo.scale_num /
               (cinfo.scale_denom * 2)) >= dw &&
         (int)(cinfo.image_height * cinfo.scale_num /
               (cinfo.scale_denom * 2)) >= dh) {
    cinfo.scale_denom *= 2;
  }
  jpeg_start_decompress(&cinfo);
  const int sw = cinfo.output_width, sh = cinfo.output_height;
  scratch.resize((size_t)sw * sh * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = scratch.data() + (size_t)cinfo.output_scanline * sw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  resize_bilinear(scratch.data(), sh, sw, dst, dh, dw);
  return 0;
}

}  // namespace

// Decode n JPEGs (paths: array of C strings) into out[n, dh, dw, 3] with
// nthreads workers. Returns number successfully decoded.
extern "C" int svtpu_jpeg_decode_batch(const char** paths, int n,
                                       uint8_t* out, int dh, int dw,
                                       int nthreads) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  if (nthreads > n) nthreads = n > 0 ? n : 1;
  std::atomic<int> next(0), ok(0);
  auto worker = [&]() {
    std::vector<uint8_t> scratch;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      uint8_t* dst = out + (size_t)i * dh * dw * 3;
      if (decode_one(paths[i], dst, dh, dw, scratch) == 0) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// Version/capability probe.
extern "C" int svtpu_io_version() { return 1; }
