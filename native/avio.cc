// libav-backed media I/O for video3d_tpu (in-process, no ffmpeg binary).
//
// The reference shells out to an ffmpeg binary for every decode/encode/
// audio-extract (reference utils.py:41-119, depth.py:215-220,
// upscale.py:47-63). TPU hosts frequently ship the libav* shared
// libraries (pulled in by OpenCV) without the ffmpeg CLI; this module
// talks to libavformat/libavcodec/libswresample/libswscale directly, so
// the framework keeps the reference's codec contract (h264 crf/preset
// via libx264, AAC audio decode) with zero subprocess/pipe overhead:
//
//  * v3d_av_audio_to_wav  -- any-codec audio track -> mono s16 WAV at a
//    target rate (closes the AAC gap of v3d_mp4_extract_pcm, which only
//    handles uncompressed PCM tracks);
//  * v3d_av_reader_*      -- streaming RGB24 (or raw decode-only) frame
//    reader with frame-accurate seek;
//  * v3d_av_writer_*      -- streaming libx264 yuv420p encoder
//    (crf/preset per reference upscale.py:56-59) with a grayscale fast
//    path: depth maps are single-channel, so Y is a 256-LUT of the gray
//    value (limited-range BT.601, matching swscale's rgb24->yuv420p for
//    r=g=b) and U=V=128 -- no 3-channel expansion, no per-pixel matrix.
//
// Built as a SEPARATE shared library (libv3dav.so) so hosts without the
// libav runtime still load libv3dpng.so; the Python bindings degrade to
// the ffmpeg-subprocess/OpenCV paths when this library is absent.
//
// All functions are extern "C"; errors are returned as nonzero codes
// with a message in (errbuf, errlen).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

namespace {

void set_err(char* errbuf, int errlen, const std::string& msg) {
  if (errbuf && errlen > 0) {
    snprintf(errbuf, size_t(errlen), "%s", msg.c_str());
  }
}

std::string averr(int code) {
  char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
  av_strerror(code, buf, sizeof(buf));
  return std::string(buf);
}

// x264/libav banners would interleave with the pipeline's progress
// output; errors still surface through the errbuf contract.
__attribute__((constructor)) void quiet_libav() {
  av_log_set_level(AV_LOG_ERROR);
}

}  // namespace

extern "C" int v3d_av_available() { return 1; }

// ---------------------------------------------------------------------------
// Audio: decode best audio stream -> mono s16 WAV at target_rate.

extern "C" int v3d_av_audio_to_wav(const char* in_path, const char* out_path,
                                   int target_rate, double max_duration,
                                   char* errbuf, int errlen) {
  AVFormatContext* fmt = nullptr;
  int rc = avformat_open_input(&fmt, in_path, nullptr, nullptr);
  if (rc < 0) {
    set_err(errbuf, errlen, std::string("open failed: ") + averr(rc));
    return -1;
  }
  struct FmtGuard {
    AVFormatContext** f;
    ~FmtGuard() { avformat_close_input(f); }
  } fmt_guard{&fmt};
  if ((rc = avformat_find_stream_info(fmt, nullptr)) < 0) {
    set_err(errbuf, errlen, "no stream info: " + averr(rc));
    return -1;
  }
  const AVCodec* dec = nullptr;
  int aidx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
  if (aidx < 0 || !dec) {
    set_err(errbuf, errlen, "no decodable audio stream");
    return -2;
  }
  AVStream* st = fmt->streams[aidx];
  AVCodecContext* ctx = avcodec_alloc_context3(dec);
  if (!ctx) {
    set_err(errbuf, errlen, "codec ctx alloc failed");
    return -1;
  }
  struct CtxGuard {
    AVCodecContext** c;
    ~CtxGuard() { avcodec_free_context(c); }
  } ctx_guard{&ctx};
  if ((rc = avcodec_parameters_to_context(ctx, st->codecpar)) < 0 ||
      (rc = avcodec_open2(ctx, dec, nullptr)) < 0) {
    set_err(errbuf, errlen, "decoder open failed: " + averr(rc));
    return -1;
  }

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  AVChannelLayout in_layout;
  if (ctx->ch_layout.nb_channels > 0) {
    av_channel_layout_copy(&in_layout, &ctx->ch_layout);
  } else {
    av_channel_layout_default(&in_layout, 2);
  }
  rc = swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_S16, target_rate,
                           &in_layout, ctx->sample_fmt,
                           ctx->sample_rate > 0 ? ctx->sample_rate : 48000,
                           0, nullptr);
  av_channel_layout_uninit(&in_layout);
  if (rc < 0 || !swr || (rc = swr_init(swr)) < 0) {
    set_err(errbuf, errlen, "resampler init failed: " + averr(rc));
    if (swr) swr_free(&swr);
    return -1;
  }
  struct SwrGuard {
    SwrContext** s;
    ~SwrGuard() { swr_free(s); }
  } swr_guard{&swr};

  FILE* out = fopen(out_path, "wb");
  if (!out) {
    set_err(errbuf, errlen, std::string("cannot open ") + out_path);
    return -1;
  }
  // 44-byte placeholder header; sizes patched at the end.
  uint8_t hdr44[44] = {0};
  fwrite(hdr44, 1, 44, out);

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frm = av_frame_alloc();
  uint64_t out_samples = 0;
  const uint64_t max_samples =
      max_duration > 0 ? uint64_t(max_duration * target_rate) : UINT64_MAX;
  std::string fail;
  std::vector<int16_t> buf;

  auto drain_swr = [&](const AVFrame* in) -> bool {
    // upper bound on produced samples for this input
    int in_n = in ? in->nb_samples : 0;
    int64_t delay = swr_get_delay(swr, target_rate);
    int cap = int(delay) + int(av_rescale_rnd(in_n, target_rate,
                                              ctx->sample_rate > 0
                                                  ? ctx->sample_rate
                                                  : 48000,
                                              AV_ROUND_UP)) +
              64;
    buf.resize(size_t(cap));
    uint8_t* outp = reinterpret_cast<uint8_t*>(buf.data());
    int n = swr_convert(swr, &outp, cap,
                        in ? const_cast<const uint8_t**>(in->extended_data)
                           : nullptr,
                        in_n);
    if (n < 0) {
      fail = "resample failed: " + averr(n);
      return false;
    }
    uint64_t keep = std::min<uint64_t>(uint64_t(n),
                                       max_samples - out_samples);
    if (keep > 0 &&
        fwrite(buf.data(), 2, size_t(keep), out) != size_t(keep)) {
      fail = "wav write failed";
      return false;
    }
    out_samples += keep;
    return out_samples < max_samples;
  };

  bool more = true;
  while (more && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == aidx) {
      if (avcodec_send_packet(ctx, pkt) >= 0) {
        while (avcodec_receive_frame(ctx, frm) >= 0) {
          if (!drain_swr(frm)) {
            more = false;
            break;
          }
        }
      }
    }
    av_packet_unref(pkt);
  }
  if (more && fail.empty()) {  // flush decoder + resampler
    avcodec_send_packet(ctx, nullptr);
    while (avcodec_receive_frame(ctx, frm) >= 0) {
      if (!drain_swr(frm)) break;
    }
    if (fail.empty() && out_samples < max_samples) drain_swr(nullptr);
  }
  av_frame_free(&frm);
  av_packet_free(&pkt);

  if (fail.empty() && out_samples == 0) fail = "decoded zero audio samples";
  if (!fail.empty()) {
    fclose(out);
    remove(out_path);
    set_err(errbuf, errlen, fail);
    return -1;
  }
  // patch the WAV header (PCM mono s16le)
  uint32_t data_bytes = uint32_t(std::min<uint64_t>(
      out_samples * 2, 0xffffffffull - 44));
  uint8_t h[44];
  memcpy(h, "RIFF", 4);
  uint32_t riff = 36 + data_bytes;
  for (int i = 0; i < 4; i++) h[4 + i] = uint8_t((riff >> (8 * i)) & 0xff);
  memcpy(h + 8, "WAVEfmt ", 8);
  uint32_t fmtlen = 16;
  for (int i = 0; i < 4; i++) h[16 + i] = uint8_t((fmtlen >> (8 * i)) & 0xff);
  h[20] = 1; h[21] = 0;  // PCM
  h[22] = 1; h[23] = 0;  // mono
  uint32_t rate = uint32_t(target_rate);
  for (int i = 0; i < 4; i++) h[24 + i] = uint8_t((rate >> (8 * i)) & 0xff);
  uint32_t byterate = rate * 2;
  for (int i = 0; i < 4; i++)
    h[28 + i] = uint8_t((byterate >> (8 * i)) & 0xff);
  h[32] = 2; h[33] = 0;   // block align
  h[34] = 16; h[35] = 0;  // bits
  memcpy(h + 36, "data", 4);
  for (int i = 0; i < 4; i++)
    h[40 + i] = uint8_t((data_bytes >> (8 * i)) & 0xff);
  bool ok = fseek(out, 0, SEEK_SET) == 0 && fwrite(h, 1, 44, out) == 44;
  fclose(out);
  if (!ok) {
    set_err(errbuf, errlen, "wav header patch failed");
    return -1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Audio: mono s16 WAV -> AAC-LC in M4A. Round-trip partner of
// v3d_av_audio_to_wav: lets tests (and sidecar-audio tooling) author
// compressed-audio containers on ffmpeg-less hosts.

extern "C" int v3d_av_wav_to_m4a(const char* in_wav, const char* out_path,
                                 int bitrate, char* errbuf, int errlen) {
  // minimal RIFF parse: mono/stereo s16le PCM (core/audio.py write_wav)
  FILE* in = fopen(in_wav, "rb");
  if (!in) {
    set_err(errbuf, errlen, std::string("cannot open ") + in_wav);
    return -1;
  }
  uint8_t h[44];
  if (fread(h, 1, 44, in) != 44 || memcmp(h, "RIFF", 4) ||
      memcmp(h + 8, "WAVEfmt ", 8) || h[20] != 1) {
    set_err(errbuf, errlen, "not a PCM WAV");
    fclose(in);
    return -1;
  }
  int channels = h[22] | (h[23] << 8);
  int rate = h[24] | (h[25] << 8) | (h[26] << 16) | (h[27] << 24);
  int bits = h[34] | (h[35] << 8);
  if (bits != 16 || channels < 1 || channels > 2) {
    set_err(errbuf, errlen, "only s16 mono/stereo WAV supported");
    fclose(in);
    return -1;
  }
  std::vector<int16_t> pcm;
  {
    uint8_t buf[8192];
    size_t n;
    while ((n = fread(buf, 1, sizeof(buf), in)) > 0) {
      size_t old = pcm.size();
      pcm.resize(old + n / 2);
      memcpy(pcm.data() + old, buf, (n / 2) * 2);
    }
  }
  fclose(in);

  AVFormatContext* fmt = nullptr;
  int rc = avformat_alloc_output_context2(&fmt, nullptr, "mp4", out_path);
  const AVCodec* enc = avcodec_find_encoder(AV_CODEC_ID_AAC);
  if (rc < 0 || !fmt || !enc) {
    set_err(errbuf, errlen, "mp4/aac output unavailable");
    if (fmt) avformat_free_context(fmt);
    return -1;
  }
  AVCodecContext* ctx = avcodec_alloc_context3(enc);
  ctx->sample_rate = rate;
  av_channel_layout_default(&ctx->ch_layout, channels);
  ctx->sample_fmt = enc->sample_fmts ? enc->sample_fmts[0]
                                     : AV_SAMPLE_FMT_FLTP;
  ctx->bit_rate = bitrate > 0 ? bitrate : 128000;
  ctx->time_base = AVRational{1, rate};
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER) {
    ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  }
  AVStream* st = avformat_new_stream(fmt, enc);
  std::string fail;
  SwrContext* swr = nullptr;
  AVFrame* frm = nullptr;
  AVPacket* pkt = nullptr;
  if ((rc = avcodec_open2(ctx, enc, nullptr)) < 0) {
    fail = "aac encoder open failed: " + averr(rc);
  } else if (!st ||
             (rc = avcodec_parameters_from_context(st->codecpar, ctx)) < 0) {
    fail = "stream setup failed";
  } else if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
             (rc = avio_open(&fmt->pb, out_path, AVIO_FLAG_WRITE)) < 0) {
    fail = std::string("cannot open ") + out_path;
  } else if ((rc = avformat_write_header(fmt, nullptr)) < 0) {
    fail = "header write failed: " + averr(rc);
  } else {
    st->time_base = AVRational{1, rate};
    AVChannelLayout layout;
    av_channel_layout_default(&layout, channels);
    rc = swr_alloc_set_opts2(&swr, &ctx->ch_layout, ctx->sample_fmt, rate,
                             &layout, AV_SAMPLE_FMT_S16, rate, 0, nullptr);
    av_channel_layout_uninit(&layout);
    if (rc < 0 || swr_init(swr) < 0) fail = "resampler init failed";
  }
  if (fail.empty()) {
    frm = av_frame_alloc();
    pkt = av_packet_alloc();
    const int fsz = ctx->frame_size > 0 ? ctx->frame_size : 1024;
    const int64_t total = int64_t(pcm.size()) / channels;
    int64_t pos = 0, pts = 0;
    auto drain = [&](AVFrame* f) -> bool {
      int rc2 = avcodec_send_frame(ctx, f);
      if (rc2 < 0) {
        fail = "send_frame: " + averr(rc2);
        return false;
      }
      for (;;) {
        rc2 = avcodec_receive_packet(ctx, pkt);
        if (rc2 == AVERROR(EAGAIN) || rc2 == AVERROR_EOF) return true;
        if (rc2 < 0) {
          fail = "receive_packet: " + averr(rc2);
          return false;
        }
        av_packet_rescale_ts(pkt, ctx->time_base, st->time_base);
        pkt->stream_index = 0;
        if (av_interleaved_write_frame(fmt, pkt) < 0) {
          fail = "packet write failed";
          return false;
        }
      }
    };
    while (pos < total && fail.empty()) {
      int n = int(std::min<int64_t>(fsz, total - pos));
      frm->nb_samples = n;
      frm->format = ctx->sample_fmt;
      av_channel_layout_copy(&frm->ch_layout, &ctx->ch_layout);
      frm->sample_rate = rate;
      if (av_frame_get_buffer(frm, 0) < 0) {
        fail = "frame alloc failed";
        break;
      }
      const uint8_t* src =
          reinterpret_cast<const uint8_t*>(pcm.data() + pos * channels);
      if (swr_convert(swr, frm->extended_data, n, &src, n) < 0) {
        fail = "resample failed";
        break;
      }
      frm->pts = pts;
      pts += n;
      pos += n;
      if (!drain(frm)) break;
      av_frame_unref(frm);
    }
    if (fail.empty()) {
      drain(nullptr);
      if (av_write_trailer(fmt) < 0 && fail.empty()) {
        fail = "trailer write failed";
      }
    }
  }
  if (swr) swr_free(&swr);
  if (frm) av_frame_free(&frm);
  if (pkt) av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  if (fmt->pb) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  if (!fail.empty()) {
    set_err(errbuf, errlen, fail);
    remove(out_path);
    return -1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Remux: stream-copy the video track of one file and the audio track of
// another into a single MP4 (no transcode). Pairs the depth/segment
// outputs (video-only) with their source's audio, and authors the A/V
// test clips the alignment stage consumes.

extern "C" int v3d_av_mux(const char* video_path, const char* audio_path,
                          const char* out_path, char* errbuf, int errlen) {
  AVFormatContext* vin = nullptr;
  AVFormatContext* ain = nullptr;
  AVFormatContext* out = nullptr;
  std::string fail;
  int vidx = -1, aidx = -1;
  int rc;
  if ((rc = avformat_open_input(&vin, video_path, nullptr, nullptr)) < 0 ||
      avformat_find_stream_info(vin, nullptr) < 0) {
    fail = std::string("cannot open video input: ") + averr(rc);
  } else if ((rc = avformat_open_input(&ain, audio_path, nullptr,
                                       nullptr)) < 0 ||
             avformat_find_stream_info(ain, nullptr) < 0) {
    fail = std::string("cannot open audio input: ") + averr(rc);
  } else {
    vidx = av_find_best_stream(vin, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    aidx = av_find_best_stream(ain, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
    if (vidx < 0) fail = "no video stream in video input";
    if (aidx < 0 && fail.empty()) fail = "no audio stream in audio input";
  }
  AVStream* ovs = nullptr;
  AVStream* oas = nullptr;
  if (fail.empty()) {
    rc = avformat_alloc_output_context2(&out, nullptr, "mp4", out_path);
    if (rc < 0 || !out) {
      fail = "output ctx failed";
    } else {
      ovs = avformat_new_stream(out, nullptr);
      oas = avformat_new_stream(out, nullptr);
      if (!ovs || !oas ||
          avcodec_parameters_copy(ovs->codecpar,
                                  vin->streams[vidx]->codecpar) < 0 ||
          avcodec_parameters_copy(oas->codecpar,
                                  ain->streams[aidx]->codecpar) < 0) {
        fail = "stream copy setup failed";
      } else {
        ovs->time_base = vin->streams[vidx]->time_base;
        oas->time_base = ain->streams[aidx]->time_base;
        if (!(out->oformat->flags & AVFMT_NOFILE) &&
            avio_open(&out->pb, out_path, AVIO_FLAG_WRITE) < 0) {
          fail = std::string("cannot open ") + out_path;
        } else if (avformat_write_header(out, nullptr) < 0) {
          fail = "header write failed";
        }
      }
    }
  }
  if (fail.empty()) {
    AVPacket* pkt = av_packet_alloc();
    // two sequential copy loops; the muxer interleaves by dts
    struct Src {
      AVFormatContext* f;
      int idx;
      AVStream* ost;
      int oidx;
    } srcs[2] = {{vin, vidx, ovs, 0}, {ain, aidx, oas, 1}};
    for (auto& s : srcs) {
      while (fail.empty() && av_read_frame(s.f, pkt) >= 0) {
        if (pkt->stream_index == s.idx) {
          av_packet_rescale_ts(pkt, s.f->streams[s.idx]->time_base,
                               s.ost->time_base);
          pkt->stream_index = s.oidx;
          pkt->pos = -1;
          if (av_interleaved_write_frame(out, pkt) < 0) {
            fail = "packet write failed";
          }
        }
        av_packet_unref(pkt);
      }
    }
    av_packet_free(&pkt);
    if (fail.empty() && av_write_trailer(out) < 0) {
      fail = "trailer write failed";
    }
  }
  if (vin) avformat_close_input(&vin);
  if (ain) avformat_close_input(&ain);
  if (out) {
    if (out->pb) avio_closep(&out->pb);
    avformat_free_context(out);
  }
  if (!fail.empty()) {
    set_err(errbuf, errlen, fail);
    remove(out_path);
    return -1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Video reader: streaming RGB24 frames with frame-accurate seek.

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  SwsContext* sws = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frm = nullptr;
  int vidx = -1;
  int w = 0, h = 0;
  double fps = 0.0;
  int64_t next_frame = 0;   // index of the next frame to emit
  int64_t skip_until = -1;  // decode-and-drop until this frame index
  bool draining = false;

  ~Reader() {
    if (sws) sws_freeContext(sws);
    if (frm) av_frame_free(&frm);
    if (pkt) av_packet_free(&pkt);
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) avformat_close_input(&fmt);
  }
};

}  // namespace

extern "C" void* v3d_av_reader_open(const char* path, int* w, int* h,
                                    double* fps, int64_t* nframes,
                                    char* errbuf, int errlen) {
  Reader* r = new Reader();
  int rc = avformat_open_input(&r->fmt, path, nullptr, nullptr);
  if (rc < 0) {
    set_err(errbuf, errlen, "open failed: " + averr(rc));
    delete r;
    return nullptr;
  }
  if ((rc = avformat_find_stream_info(r->fmt, nullptr)) < 0) {
    set_err(errbuf, errlen, "no stream info: " + averr(rc));
    delete r;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  r->vidx = av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (r->vidx < 0 || !dec) {
    set_err(errbuf, errlen, "no decodable video stream");
    delete r;
    return nullptr;
  }
  AVStream* st = r->fmt->streams[r->vidx];
  r->ctx = avcodec_alloc_context3(dec);
  if (!r->ctx ||
      (rc = avcodec_parameters_to_context(r->ctx, st->codecpar)) < 0) {
    set_err(errbuf, errlen, "codec ctx failed");
    delete r;
    return nullptr;
  }
  r->ctx->thread_count = 0;  // auto
  if ((rc = avcodec_open2(r->ctx, dec, nullptr)) < 0) {
    set_err(errbuf, errlen, "decoder open failed: " + averr(rc));
    delete r;
    return nullptr;
  }
  r->pkt = av_packet_alloc();
  r->frm = av_frame_alloc();
  r->w = r->ctx->width;
  r->h = r->ctx->height;
  AVRational fr = av_guess_frame_rate(r->fmt, st, nullptr);
  r->fps = fr.num > 0 && fr.den > 0 ? double(fr.num) / fr.den : 0.0;
  if (w) *w = r->w;
  if (h) *h = r->h;
  if (fps) *fps = r->fps;
  if (nframes) {
    int64_t n = st->nb_frames;
    if (n <= 0 && r->fps > 0 && r->fmt->duration > 0) {
      n = int64_t(double(r->fmt->duration) / AV_TIME_BASE * r->fps + 0.5);
    }
    *nframes = n > 0 ? n : -1;
  }
  return r;
}

extern "C" int v3d_av_reader_seek(void* handle, int64_t frame_idx) {
  Reader* r = static_cast<Reader*>(handle);
  if (!r || frame_idx < 0) return -1;
  AVStream* st = r->fmt->streams[r->vidx];
  if (r->fps <= 0) return -1;
  int64_t ts = av_rescale_q(int64_t(frame_idx / r->fps * AV_TIME_BASE),
                            AVRational{1, AV_TIME_BASE}, st->time_base);
  if (st->start_time != AV_NOPTS_VALUE) ts += st->start_time;
  if (av_seek_frame(r->fmt, r->vidx, ts, AVSEEK_FLAG_BACKWARD) < 0) {
    return -1;
  }
  avcodec_flush_buffers(r->ctx);
  r->draining = false;
  // the demuxer landed on the previous keyframe; decode-and-drop until
  // the requested frame. We recover the decoded position from pts.
  r->next_frame = -1;  // unknown until the first decoded frame's pts
  r->skip_until = frame_idx;
  return 0;
}

namespace {

// Emit the decoded frame as packed RGB24 into out.
bool emit_rgb(Reader* r, uint8_t* out) {
  r->sws = sws_getCachedContext(
      r->sws, r->w, r->h, AVPixelFormat(r->frm->format), r->w, r->h,
      AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!r->sws) return false;
  uint8_t* dst[4] = {out, nullptr, nullptr, nullptr};
  int dst_stride[4] = {3 * r->w, 0, 0, 0};
  sws_scale(r->sws, r->frm->data, r->frm->linesize, 0, r->h, dst,
            dst_stride);
  return true;
}

}  // namespace

extern "C" int v3d_av_reader_next(void* handle, uint8_t* rgb_out) {
  Reader* r = static_cast<Reader*>(handle);
  if (!r) return -1;
  AVStream* st = r->fmt->streams[r->vidx];
  for (;;) {
    int rc = avcodec_receive_frame(r->ctx, r->frm);
    if (rc >= 0) {
      // frame index from pts when available (exact after seeks)
      int64_t idx = r->next_frame;
      int64_t pts = r->frm->best_effort_timestamp;
      if (pts != AV_NOPTS_VALUE && r->fps > 0) {
        int64_t start =
            st->start_time != AV_NOPTS_VALUE ? st->start_time : 0;
        double sec = double(pts - start) * st->time_base.num /
                     st->time_base.den;
        idx = int64_t(sec * r->fps + 0.5);
      } else if (idx < 0) {
        idx = 0;
      }
      r->next_frame = idx + 1;
      if (r->skip_until >= 0 && idx < r->skip_until) {
        av_frame_unref(r->frm);
        continue;  // pre-roll frame from the keyframe seek
      }
      r->skip_until = -1;
      bool ok = emit_rgb(r, rgb_out);
      av_frame_unref(r->frm);
      return ok ? 1 : -1;
    }
    if (rc == AVERROR_EOF) return 0;
    if (rc != AVERROR(EAGAIN)) return -1;
    if (r->draining) return 0;
    // feed more packets
    for (;;) {
      rc = av_read_frame(r->fmt, r->pkt);
      if (rc < 0) {
        r->draining = true;
        avcodec_send_packet(r->ctx, nullptr);
        break;
      }
      if (r->pkt->stream_index == r->vidx) {
        rc = avcodec_send_packet(r->ctx, r->pkt);
        av_packet_unref(r->pkt);
        if (rc >= 0) break;
        if (rc != AVERROR(EAGAIN)) return -1;
      } else {
        av_packet_unref(r->pkt);
      }
    }
  }
}

extern "C" void v3d_av_reader_close(void* handle) {
  delete static_cast<Reader*>(handle);
}

// ---------------------------------------------------------------------------
// Video writer: libx264 yuv420p with the reference crf/preset contract.

namespace {

struct Writer {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frm = nullptr;
  AVPacket* pkt = nullptr;
  int w = 0, h = 0;
  int gray = 0;
  int64_t n = 0;
  bool header = false;
  uint8_t luma_lut[256];  // limited-range BT.601 luma of gray (r=g=b)
  std::string fail;

  ~Writer() {
    if (sws) sws_freeContext(sws);
    if (frm) av_frame_free(&frm);
    if (pkt) av_packet_free(&pkt);
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) {
      if (fmt->pb) avio_closep(&fmt->pb);
      avformat_free_context(fmt);
    }
  }

  bool drain(bool flush) {
    int rc = avcodec_send_frame(ctx, flush ? nullptr : frm);
    if (rc < 0) {
      fail = "send_frame: " + averr(rc);
      return false;
    }
    for (;;) {
      rc = avcodec_receive_packet(ctx, pkt);
      if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return true;
      if (rc < 0) {
        fail = "receive_packet: " + averr(rc);
        return false;
      }
      av_packet_rescale_ts(pkt, ctx->time_base,
                           fmt->streams[0]->time_base);
      pkt->stream_index = 0;
      rc = av_interleaved_write_frame(fmt, pkt);
      if (rc < 0) {
        fail = "write_frame: " + averr(rc);
        return false;
      }
    }
  }
};

}  // namespace

extern "C" void* v3d_av_writer_open(const char* path, int w, int h,
                                    double fps, int crf, const char* preset,
                                    int gray, int threads, char* errbuf,
                                    int errlen) {
  Writer* wr = new Writer();
  wr->w = w;
  wr->h = h;
  wr->gray = gray;
  int rc = avformat_alloc_output_context2(&wr->fmt, nullptr, nullptr, path);
  if (rc < 0 || !wr->fmt) {
    set_err(errbuf, errlen, "output ctx failed: " + averr(rc));
    delete wr;
    return nullptr;
  }
  const AVCodec* enc = avcodec_find_encoder_by_name("libx264");
  if (!enc) enc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!enc) {
    set_err(errbuf, errlen, "no h264/mpeg4 encoder in libavcodec");
    delete wr;
    return nullptr;
  }
  wr->ctx = avcodec_alloc_context3(enc);
  wr->ctx->width = w;
  wr->ctx->height = h;
  wr->ctx->pix_fmt = AV_PIX_FMT_YUV420P;
  AVRational fr = av_d2q(fps, 1000000);
  wr->ctx->time_base = AVRational{fr.den, fr.num};
  wr->ctx->framerate = fr;
  wr->ctx->color_range = AVCOL_RANGE_MPEG;
  wr->ctx->thread_count = threads > 0 ? threads : 0;
  if (wr->fmt->oformat->flags & AVFMT_GLOBALHEADER) {
    wr->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  }
  if (!strcmp(enc->name, "libx264")) {
    char crfs[16];
    snprintf(crfs, sizeof(crfs), "%d", crf);
    av_opt_set(wr->ctx->priv_data, "crf", crfs, 0);
    av_opt_set(wr->ctx->priv_data, "preset",
               preset && *preset ? preset : "medium", 0);
  } else {
    wr->ctx->bit_rate = int64_t(w) * h * 4;  // mpeg4 fallback: fixed rate
  }
  if ((rc = avcodec_open2(wr->ctx, enc, nullptr)) < 0) {
    set_err(errbuf, errlen, "encoder open failed: " + averr(rc));
    delete wr;
    return nullptr;
  }
  AVStream* st = avformat_new_stream(wr->fmt, enc);
  if (!st ||
      (rc = avcodec_parameters_from_context(st->codecpar, wr->ctx)) < 0) {
    set_err(errbuf, errlen, "stream setup failed");
    delete wr;
    return nullptr;
  }
  st->time_base = wr->ctx->time_base;
  st->avg_frame_rate = fr;
  if (!(wr->fmt->oformat->flags & AVFMT_NOFILE)) {
    if ((rc = avio_open(&wr->fmt->pb, path, AVIO_FLAG_WRITE)) < 0) {
      set_err(errbuf, errlen, std::string("cannot open ") + path + ": " +
                                  averr(rc));
      delete wr;
      return nullptr;
    }
  }
  if ((rc = avformat_write_header(wr->fmt, nullptr)) < 0) {
    set_err(errbuf, errlen, "header write failed: " + averr(rc));
    delete wr;
    return nullptr;
  }
  wr->header = true;
  wr->frm = av_frame_alloc();
  wr->frm->format = AV_PIX_FMT_YUV420P;
  wr->frm->width = w;
  wr->frm->height = h;
  if ((rc = av_frame_get_buffer(wr->frm, 0)) < 0) {
    set_err(errbuf, errlen, "frame alloc failed: " + averr(rc));
    delete wr;
    return nullptr;
  }
  wr->pkt = av_packet_alloc();
  // limited-range luma LUT: for r=g=b=g the BT.601 matrix collapses to
  // Y = 16 + 219*g/255 (swscale's rgb24->yuv420p agrees within +-1)
  for (int i = 0; i < 256; i++) {
    wr->luma_lut[i] = uint8_t(16 + (219 * i + 127) / 255);
  }
  return wr;
}

extern "C" int v3d_av_writer_write(void* handle, const uint8_t* data) {
  Writer* wr = static_cast<Writer*>(handle);
  if (!wr || !wr->fail.empty()) return -1;
  int rc = av_frame_make_writable(wr->frm);
  if (rc < 0) {
    wr->fail = "frame not writable";
    return -1;
  }
  const int w = wr->w, h = wr->h;
  if (wr->gray) {
    // gray fast path: Y = LUT(g) rowwise, U = V = 128
    for (int y = 0; y < h; y++) {
      const uint8_t* src = data + size_t(y) * w;
      uint8_t* dst = wr->frm->data[0] + size_t(y) * wr->frm->linesize[0];
      for (int x = 0; x < w; x++) dst[x] = wr->luma_lut[src[x]];
    }
    for (int p = 1; p <= 2; p++) {
      for (int y = 0; y < h / 2; y++) {
        memset(wr->frm->data[p] + size_t(y) * wr->frm->linesize[p], 128,
               size_t(w / 2));
      }
    }
  } else {
    wr->sws = sws_getCachedContext(wr->sws, w, h, AV_PIX_FMT_RGB24, w, h,
                                   AV_PIX_FMT_YUV420P, SWS_BILINEAR,
                                   nullptr, nullptr, nullptr);
    if (!wr->sws) {
      wr->fail = "sws ctx failed";
      return -1;
    }
    const uint8_t* src[4] = {data, nullptr, nullptr, nullptr};
    int src_stride[4] = {3 * w, 0, 0, 0};
    sws_scale(wr->sws, src, src_stride, 0, h, wr->frm->data,
              wr->frm->linesize);
  }
  wr->frm->pts = wr->n++;
  return wr->drain(false) ? 0 : -1;
}

extern "C" int v3d_av_writer_close(void* handle, char* errbuf, int errlen) {
  Writer* wr = static_cast<Writer*>(handle);
  if (!wr) return -1;
  int rc = 0;
  if (wr->fail.empty() && wr->header) {
    if (!wr->drain(true)) rc = -1;
    int trc = av_write_trailer(wr->fmt);
    if (trc < 0 && rc == 0) {
      wr->fail = "trailer write failed: " + averr(trc);
      rc = -1;
    }
  } else if (!wr->fail.empty()) {
    rc = -1;
  }
  if (rc != 0) set_err(errbuf, errlen, wr->fail);
  delete wr;
  return rc;
}
