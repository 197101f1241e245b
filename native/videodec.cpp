// dist_tpu native video decoder.
//
// The TPU-native replacement for the decord C++ decoder the reference
// depends on (dataset/base/base_dataset.py:19-25,295): clip-seek decode of
// selected frame indices straight into a caller-provided uint8 RGB buffer,
// with an optional short-side bilinear resize fused into the colorspace
// conversion (one swscale pass), and a batch API that decodes many clips on
// an internal thread pool without ever touching the Python GIL.
//
// Built as a plain C ABI shared library consumed via ctypes
// (dist_tpu/data/native_decoder.py).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct ProbeResult {
  int64_t num_frames;
  double fps;
  int width;
  int height;
};

struct DecodeRequest {
  const char* path;
  const int64_t* indices;  // sorted or unsorted frame indices
  int num_indices;
  uint8_t* out;            // (num_indices, out_h, out_w, 3) uint8 RGB
  int out_h;               // 0 = native size (caller must size the buffer)
  int out_w;
};

int probe_file(const char* path, ProbeResult* res) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  int vstream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vstream < 0) {
    avformat_close_input(&fmt);
    return -3;
  }
  AVStream* st = fmt->streams[vstream];
  double fps = av_q2d(st->avg_frame_rate.num ? st->avg_frame_rate
                                             : st->r_frame_rate);
  int64_t frames = st->nb_frames;
  if (frames <= 0 && st->duration > 0) {
    frames = static_cast<int64_t>(st->duration * av_q2d(st->time_base) * fps);
  }
  if (frames <= 0 && fmt->duration > 0) {
    frames = static_cast<int64_t>(fmt->duration / (double)AV_TIME_BASE * fps);
  }
  res->num_frames = frames;
  res->fps = fps > 0 ? fps : 30.0;
  res->width = st->codecpar->width;
  res->height = st->codecpar->height;
  avformat_close_input(&fmt);
  return 0;
}

// Decode the requested frames of one file into req->out.
int decode_one(const DecodeRequest& req) {
  if (req.num_indices <= 0) return 0;  // empty request: nothing to write
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, req.path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  int vstream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vstream < 0) {
    avformat_close_input(&fmt);
    return -3;
  }
  AVStream* st = fmt->streams[vstream];
  const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!codec) {
    avformat_close_input(&fmt);
    return -4;
  }
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, st->codecpar);
  ctx->thread_count = 1;  // parallelism comes from the batch pool
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -5;
  }

  // sort wanted indices; remember output slots
  std::vector<std::pair<int64_t, int>> wanted(req.num_indices);
  for (int i = 0; i < req.num_indices; ++i) wanted[i] = {req.indices[i], i};
  std::sort(wanted.begin(), wanted.end());
  int64_t max_idx = wanted.back().first;

  int out_w = req.out_w > 0 ? req.out_w : st->codecpar->width;
  int out_h = req.out_h > 0 ? req.out_h : st->codecpar->height;
  size_t frame_bytes = static_cast<size_t>(out_w) * out_h * 3;

  SwsContext* sws = nullptr;
  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  // swscale writes SIMD-width past unaligned row ends; convert into an
  // aligned scratch image and row-copy into the caller's tight buffer
  uint8_t* tmp_data[4] = {nullptr, nullptr, nullptr, nullptr};
  int tmp_linesize[4] = {0, 0, 0, 0};
  if (av_image_alloc(tmp_data, tmp_linesize, out_w, out_h, AV_PIX_FMT_RGB24,
                     64) < 0) {
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -7;
  }

  // seek near the first wanted frame when it is far into the stream
  int64_t first = wanted.front().first;
  int64_t cur = 0;
  double fps = av_q2d(st->avg_frame_rate.num ? st->avg_frame_rate
                                             : st->r_frame_rate);
  if (fps <= 0) fps = 30.0;
  // pts of frame 0: streams can start at a nonzero offset (edit lists,
  // transport streams); without it the post-seek index math shifts clips
  int64_t start_pts =
      st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time;
  if (first > 64) {
    int64_t ts = start_pts + av_rescale_q(
        static_cast<int64_t>(first / fps * AV_TIME_BASE),
        AVRational{1, AV_TIME_BASE}, st->time_base);
    if (av_seek_frame(fmt, vstream, ts, AVSEEK_FLAG_BACKWARD) >= 0) {
      avcodec_flush_buffers(ctx);
      cur = -1;  // unknown until first decoded frame's pts
    }
  }

  size_t next_wanted = 0;
  int err = 0;
  int wrote = 0;
  // keep a ref to the most recent decoded frame: indices past EOF pad with
  // the TRUE last frame (decord clamp semantics), not the last wanted slot
  AVFrame* last_frame = av_frame_alloc();
  // set when a post-seek frame carries no usable pts: the frame index is
  // unknowable (AVSEEK_FLAG_BACKWARD lands on an arbitrary earlier
  // keyframe — assuming `first` would deliver temporally shifted clips),
  // so restart from the stream start and count frames sequentially
  bool restart_no_seek = false;
  auto consume_frame = [&]() {
    if (cur < 0) {
      // derive the frame index from pts after a seek
      int64_t pts = frame->best_effort_timestamp;
      if (pts == AV_NOPTS_VALUE) {
        restart_no_seek = true;
        return;
      }
      cur = llround((pts - start_pts) * av_q2d(st->time_base) * fps);
    }
    av_frame_unref(last_frame);
    av_frame_ref(last_frame, frame);
    while (next_wanted < wanted.size() && wanted[next_wanted].first <= cur) {
      if (!sws) {
        sws = sws_getContext(frame->width, frame->height,
                             static_cast<AVPixelFormat>(frame->format),
                             out_w, out_h, AV_PIX_FMT_RGB24,
                             SWS_BILINEAR, nullptr, nullptr, nullptr);
      }
      sws_scale(sws, frame->data, frame->linesize, 0, frame->height,
                tmp_data, tmp_linesize);
      uint8_t* dst = req.out + frame_bytes * wanted[next_wanted].second;
      for (int row = 0; row < out_h; ++row) {
        std::memcpy(dst + static_cast<size_t>(row) * out_w * 3,
                    tmp_data[0] + static_cast<size_t>(row) * tmp_linesize[0],
                    static_cast<size_t>(out_w) * 3);
      }
      ++wrote;
      ++next_wanted;
    }
    ++cur;
  };
  while (next_wanted < wanted.size()) {
    if (restart_no_seek) {
      restart_no_seek = false;
      if (av_seek_frame(fmt, vstream, start_pts,
                        AVSEEK_FLAG_BACKWARD) >= 0) {
        avcodec_flush_buffers(ctx);
        cur = 0;  // sequential count from the true frame 0 (slower, exact)
      } else {
        cur = first;  // unseekable stream: best-effort old behavior
      }
    }
    int r = av_read_frame(fmt, pkt);
    if (r < 0) break;  // EOF: drain the codec below, then pad
    if (pkt->stream_index != vstream) {
      av_packet_unref(pkt);
      continue;
    }
    if (avcodec_send_packet(ctx, pkt) < 0) {
      av_packet_unref(pkt);
      continue;
    }
    av_packet_unref(pkt);
    while (avcodec_receive_frame(ctx, frame) == 0) {
      consume_frame();
      if (restart_no_seek || cur > max_idx) break;
    }
    if (cur > max_idx && next_wanted >= wanted.size()) break;
  }
  if (next_wanted < wanted.size()) {
    // drain: B-frame codecs buffer several frames; without the nullptr
    // flush the last frames of the file are never received and trailing
    // wanted indices get silently padded with an earlier frame
    avcodec_send_packet(ctx, nullptr);
    while (avcodec_receive_frame(ctx, frame) == 0) {
      consume_frame();
      if (next_wanted >= wanted.size()) break;
    }
  }

  // pad any frames past EOF with the last decoded frame
  if (next_wanted < wanted.size() && last_frame->width > 0) {
    if (!sws) {
      sws = sws_getContext(last_frame->width, last_frame->height,
                           static_cast<AVPixelFormat>(last_frame->format),
                           out_w, out_h, AV_PIX_FMT_RGB24,
                           SWS_BILINEAR, nullptr, nullptr, nullptr);
    }
    sws_scale(sws, last_frame->data, last_frame->linesize, 0,
              last_frame->height, tmp_data, tmp_linesize);
    while (next_wanted < wanted.size()) {
      uint8_t* dst = req.out + frame_bytes * wanted[next_wanted].second;
      for (int row = 0; row < out_h; ++row) {
        std::memcpy(dst + static_cast<size_t>(row) * out_w * 3,
                    tmp_data[0] + static_cast<size_t>(row) * tmp_linesize[0],
                    static_cast<size_t>(out_w) * 3);
      }
      ++wrote;
      ++next_wanted;
    }
  }
  if (wrote == 0) err = -6;

  if (sws) sws_freeContext(sws);
  av_freep(&tmp_data[0]);
  av_frame_free(&last_frame);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  return err;
}

}  // namespace

extern "C" {

int dist_video_probe(const char* path, int64_t* num_frames, double* fps,
                     int* width, int* height) {
  ProbeResult res;
  int rc = probe_file(path, &res);
  if (rc != 0) return rc;
  *num_frames = res.num_frames;
  *fps = res.fps;
  *width = res.width;
  *height = res.height;
  return 0;
}

int dist_video_decode(const char* path, const int64_t* indices,
                      int num_indices, uint8_t* out, int out_h, int out_w) {
  DecodeRequest req{path, indices, num_indices, out, out_h, out_w};
  return decode_one(req);
}

// Batch API: decode `n` clips concurrently on `num_threads` workers.
// paths: array of n C strings; indices: concatenated, offsets[i] gives the
// start of clip i (offsets has n+1 entries); out: concatenated buffers of
// shape (num_indices_i, out_h, out_w, 3) in clip order (out_h/out_w > 0
// required for the batch API so the layout is uniform).
int dist_video_decode_batch(const char** paths, const int64_t* indices,
                            const int64_t* offsets, int n, uint8_t* out,
                            int out_h, int out_w, int num_threads,
                            int* statuses) {
  if (out_h <= 0 || out_w <= 0) return -100;
  size_t frame_bytes = static_cast<size_t>(out_w) * out_h * 3;
  std::atomic<int> next(0);
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      int cnt = static_cast<int>(offsets[i + 1] - offsets[i]);
      uint8_t* dst = out + frame_bytes * offsets[i];
      DecodeRequest req{paths[i], indices + offsets[i], cnt, dst, out_h, out_w};
      statuses[i] = decode_one(req);
    }
  };
  int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  int rc = 0;
  for (int i = 0; i < n; ++i)
    if (statuses[i] != 0) rc = statuses[i];
  return rc;
}

}  // extern "C"
