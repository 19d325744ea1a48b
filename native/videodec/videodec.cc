// See videodec.h. Frame-accurate FFmpeg decoder with a demux-scan pts index.

#include "videodec.h"

#include <algorithm>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

thread_local std::string g_error;

void set_error(const std::string& msg) { g_error = msg; }

void set_av_error(const std::string& what, int err) {
  char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
  av_strerror(err, buf, sizeof(buf));
  set_error(what + ": " + buf);
}

struct FrameEntry {
  int64_t pts;       // presentation timestamp (stream time_base)
  bool keyframe;
};

}  // namespace

struct VDHandle {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int stream_index = -1;
  int width = 0, height = 0;
  double duration_sec = 0.0;
  // sws_scale's SIMD paths can write past a tightly-packed row (width*3 not
  // a multiple of the vector width), so scale into this padded/aligned
  // buffer and memcpy rows into the caller's tight buffer.
  uint8_t* scale_buf = nullptr;
  int scale_stride = 0;
  std::vector<FrameEntry> index;  // sorted by pts; position == frame number
  // decoder cursor: index of the NEXT frame the decoder will emit, or -1 if
  // the decoder position is unknown (just seeked / fresh).
  int64_t next_frame = -1;

  ~VDHandle() {
    if (scale_buf) av_free(scale_buf);
    if (sws) sws_freeContext(sws);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }
};

namespace {

// Demux (no decode) the whole stream once, recording each packet's pts so
// frame number <-> pts is exact. B-frames make packet (dts) order differ from
// presentation order, so sort by pts at the end.
bool build_index(VDHandle* h) {
  AVPacket* pkt = av_packet_alloc();
  while (av_read_frame(h->fmt, pkt) >= 0) {
    if (pkt->stream_index == h->stream_index) {
      int64_t pts = pkt->pts != AV_NOPTS_VALUE ? pkt->pts : pkt->dts;
      h->index.push_back({pts, (pkt->flags & AV_PKT_FLAG_KEY) != 0});
    }
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  if (h->index.empty()) {
    set_error("no packets in video stream");
    return false;
  }
  std::sort(h->index.begin(), h->index.end(),
            [](const FrameEntry& a, const FrameEntry& b) { return a.pts < b.pts; });
  // rewind for decoding
  av_seek_frame(h->fmt, h->stream_index, h->index.front().pts,
                AVSEEK_FLAG_BACKWARD);
  return true;
}

// Find the frame number of the keyframe at-or-before `target`.
int64_t keyframe_before(const VDHandle* h, int64_t target) {
  for (int64_t i = target; i >= 0; --i) {
    if (h->index[i].keyframe) return i;
  }
  return 0;
}

// Position the decoder so the next emitted frame is <= target's keyframe.
bool seek_to(VDHandle* h, int64_t frame_no) {
  int64_t key = keyframe_before(h, frame_no);
  int err = av_seek_frame(h->fmt, h->stream_index, h->index[key].pts,
                          AVSEEK_FLAG_BACKWARD);
  if (err < 0) {
    set_av_error("av_seek_frame", err);
    return false;
  }
  avcodec_flush_buffers(h->codec);
  h->next_frame = -1;  // unknown until the first decoded frame reports pts
  return true;
}

// Frame number for a decoded frame by pts lookup (exact match expected).
int64_t frame_number_for_pts(const VDHandle* h, int64_t pts) {
  auto it = std::lower_bound(
      h->index.begin(), h->index.end(), pts,
      [](const FrameEntry& e, int64_t p) { return e.pts < p; });
  if (it == h->index.end()) return (int64_t)h->index.size() - 1;
  return it - h->index.begin();
}

// Decode forward until frame `target` is emitted; convert into rgb_out.
bool decode_until(VDHandle* h, int64_t target, uint8_t* rgb_out) {
  while (true) {
    int err = avcodec_receive_frame(h->codec, h->frame);
    if (err == 0) {
      int64_t pts = h->frame->best_effort_timestamp != AV_NOPTS_VALUE
                        ? h->frame->best_effort_timestamp
                        : h->frame->pts;
      int64_t no = h->next_frame >= 0 ? h->next_frame : frame_number_for_pts(h, pts);
      h->next_frame = no + 1;
      if (no >= target) {
        uint8_t* dst[1] = {h->scale_buf};
        int dst_stride[1] = {h->scale_stride};
        sws_scale(h->sws, h->frame->data, h->frame->linesize, 0, h->height,
                  dst, dst_stride);
        for (int row = 0; row < h->height; ++row) {
          std::memcpy(rgb_out + (int64_t)row * 3 * h->width,
                      h->scale_buf + (int64_t)row * h->scale_stride,
                      3 * h->width);
        }
        av_frame_unref(h->frame);
        return true;
      }
      av_frame_unref(h->frame);
      continue;
    }
    if (err != AVERROR(EAGAIN) && err != AVERROR_EOF) {
      set_av_error("avcodec_receive_frame", err);
      return false;
    }
    if (err == AVERROR_EOF) {
      set_error("EOF before reaching frame " + std::to_string(target));
      return false;
    }
    // feed more packets
    while (true) {
      err = av_read_frame(h->fmt, h->pkt);
      if (err < 0) {
        // flush
        avcodec_send_packet(h->codec, nullptr);
        break;
      }
      if (h->pkt->stream_index != h->stream_index) {
        av_packet_unref(h->pkt);
        continue;
      }
      err = avcodec_send_packet(h->codec, h->pkt);
      av_packet_unref(h->pkt);
      if (err == 0) break;
      if (err != AVERROR(EAGAIN)) {
        set_av_error("avcodec_send_packet", err);
        return false;
      }
    }
  }
}

}  // namespace

extern "C" {

VDHandle* vd_open(const char* path, int num_threads) {
  auto h = new VDHandle();
  int err = avformat_open_input(&h->fmt, path, nullptr, nullptr);
  if (err < 0) {
    set_av_error("avformat_open_input", err);
    delete h;
    return nullptr;
  }
  err = avformat_find_stream_info(h->fmt, nullptr);
  if (err < 0) {
    set_av_error("avformat_find_stream_info", err);
    delete h;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  h->stream_index =
      av_find_best_stream(h->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (h->stream_index < 0 || !dec) {
    set_error("no video stream found");
    delete h;
    return nullptr;
  }
  AVStream* st = h->fmt->streams[h->stream_index];
  h->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(h->codec, st->codecpar);
  h->codec->thread_count = num_threads > 0 ? num_threads : 1;
  err = avcodec_open2(h->codec, dec, nullptr);
  if (err < 0) {
    set_av_error("avcodec_open2", err);
    delete h;
    return nullptr;
  }
  h->width = h->codec->width;
  h->height = h->codec->height;
  h->frame = av_frame_alloc();
  h->pkt = av_packet_alloc();
  h->sws = sws_getContext(h->width, h->height, h->codec->pix_fmt, h->width,
                          h->height, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                          nullptr, nullptr);
  if (!h->sws) {
    set_error("sws_getContext failed");
    delete h;
    return nullptr;
  }
  h->scale_stride = FFALIGN(3 * h->width, 64);
  h->scale_buf = (uint8_t*)av_malloc((size_t)h->scale_stride * h->height + 64);
  if (!h->scale_buf) {
    set_error("scale buffer alloc failed");
    delete h;
    return nullptr;
  }
  if (!build_index(h)) {
    delete h;
    return nullptr;
  }
  if (st->duration != AV_NOPTS_VALUE) {
    h->duration_sec = st->duration * av_q2d(st->time_base);
  } else if (h->fmt->duration != AV_NOPTS_VALUE) {
    h->duration_sec = h->fmt->duration / (double)AV_TIME_BASE;
  } else if (h->index.size() >= 2) {
    h->duration_sec = (h->index.back().pts - h->index.front().pts) *
                      av_q2d(st->time_base) *
                      h->index.size() / (double)(h->index.size() - 1);
  }
  return h;
}

void vd_close(VDHandle* h) { delete h; }

int64_t vd_num_frames(const VDHandle* h) { return (int64_t)h->index.size(); }

double vd_avg_fps(const VDHandle* h) {
  if (h->duration_sec > 0) return h->index.size() / h->duration_sec;
  AVStream* st = h->fmt->streams[h->stream_index];
  return av_q2d(st->avg_frame_rate);
}

int vd_width(const VDHandle* h) { return h->width; }
int vd_height(const VDHandle* h) { return h->height; }

int vd_get_batch(VDHandle* h, const int64_t* indices, int64_t n, uint8_t* out) {
  const int64_t frame_bytes = (int64_t)h->width * h->height * 3;
  // Serve requests in sorted order so forward decode is reused; remember the
  // output slot of each request (duplicates decode once, then memcpy).
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return indices[a] < indices[b];
  });
  int64_t prev_idx = -1, prev_slot = -1;
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t slot = order[oi];
    int64_t target = indices[slot];
    if (target < 0 || target >= (int64_t)h->index.size()) {
      set_error("frame index " + std::to_string(target) + " out of range");
      return -1;
    }
    uint8_t* dst = out + slot * frame_bytes;
    if (target == prev_idx) {
      std::memcpy(dst, out + prev_slot * frame_bytes, frame_bytes);
      continue;
    }
    // If the decoder is behind the target with no keyframe in between, keep
    // decoding forward; otherwise seek.
    bool forward_ok = h->next_frame >= 0 && h->next_frame <= target &&
                      keyframe_before(h, target) < h->next_frame;
    if (!forward_ok) {
      if (!seek_to(h, target)) return -2;
    }
    if (!decode_until(h, target, dst)) return -3;
    prev_idx = target;
    prev_slot = slot;
  }
  return 0;
}

const char* vd_last_error(void) { return g_error.c_str(); }

}  // extern "C"
