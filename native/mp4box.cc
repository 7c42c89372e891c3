// Native MP4 (ISO BMFF) box-level stream copy: cut a time window from an
// MP4 without re-encoding, for hosts without ffmpeg.
//
// The reference cuts aligned segments with `ffmpeg -ss .. -t .. -c copy`
// (reference extract_aligned.py:124-133); on ffmpeg-less hosts our
// fallback was an OpenCV decode/re-encode (lossy + slow). This remuxer
// reproduces the stream-copy contract natively: the video track's start
// snaps back to the previous sync sample (keyframe) exactly like
// ffmpeg's input seeking, every other track cuts at that same wall-clock
// time, and the selected sample byte-ranges are copied verbatim into a
// fresh ftyp+moov+mdat file with rebuilt sample tables.
//
// Scope: the common single-sample-description, non-fragmented MP4s that
// cameras/encoders/OpenCV write (stts/ctts/stsc/stsz/stco|co64/stss).
// Fragmented (moof) or multi-stsd files return an error and callers fall
// back to the decode path.
//
// Exposed C API (ctypes, see video3d_tpu/core/_native.py):
//   v3d_mp4_cut(in, out, start_s, dur_s, err, errlen) -> 0 ok, -1 error

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// byte helpers
// ---------------------------------------------------------------------------

uint32_t rd32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

uint64_t rd64(const uint8_t* p) {
  return (uint64_t(rd32(p)) << 32) | rd32(p + 4);
}

void wr32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(uint8_t(x >> 24));
  v.push_back(uint8_t(x >> 16));
  v.push_back(uint8_t(x >> 8));
  v.push_back(uint8_t(x));
}

void wr64(std::vector<uint8_t>& v, uint64_t x) {
  wr32(v, uint32_t(x >> 32));
  wr32(v, uint32_t(x));
}

void wrtype(std::vector<uint8_t>& v, const char* t) {
  v.insert(v.end(), t, t + 4);
}

uint32_t fourcc(const char* t) {
  return rd32(reinterpret_cast<const uint8_t*>(t));
}

// 64-bit-safe seek: plain fseek takes long, which is 32-bit on
// Windows/ILP32, so co64 files with sample offsets past 2 GiB would
// seek to the wrong position there.
int seek64(FILE* f, uint64_t off) {
#if defined(_WIN32)
  return _fseeki64(f, int64_t(off), SEEK_SET);
#else
  return fseeko(f, off_t(off), SEEK_SET);
#endif
}

int64_t tell64(FILE* f) {
#if defined(_WIN32)
  return _ftelli64(f);
#else
  return int64_t(ftello(f));
#endif
}

// ---------------------------------------------------------------------------
// box tree (moov only -- mdat is streamed, never held in memory)
// ---------------------------------------------------------------------------

struct Box {
  uint32_t type = 0;
  std::vector<uint8_t> payload;  // leaf content (without header)
  std::vector<Box> children;     // for containers we recurse into
  bool container = false;
};

bool is_container(uint32_t t) {
  return t == fourcc("moov") || t == fourcc("trak") || t == fourcc("mdia") ||
         t == fourcc("minf") || t == fourcc("stbl") || t == fourcc("edts");
}

struct Err {
  char* buf;
  int len;
  void set(const std::string& m) const {
    if (buf && len > 0) snprintf(buf, size_t(len), "%s", m.c_str());
  }
};

bool parse_children(const uint8_t* p, size_t n, std::vector<Box>& out,
                    const Err& err, int depth) {
  if (depth > 16) {
    err.set("box nesting too deep");
    return false;
  }
  size_t off = 0;
  while (off < n) {
    if (n - off < 8) {
      err.set("truncated box header");
      return false;
    }
    uint64_t size = rd32(p + off);
    uint32_t type = rd32(p + off + 4);
    size_t hdr = 8;
    if (size == 1) {
      if (n - off < 16) {
        err.set("truncated largesize header");
        return false;
      }
      size = rd64(p + off + 8);
      hdr = 16;
    } else if (size == 0) {
      size = n - off;  // extends to end of enclosing box
    }
    if (size < hdr || size > n - off) {
      err.set("box size out of range");
      return false;
    }
    Box b;
    b.type = type;
    if (is_container(type)) {
      b.container = true;
      if (!parse_children(p + off + hdr, size_t(size - hdr), b.children, err,
                          depth + 1))
        return false;
    } else {
      b.payload.assign(p + off + hdr, p + off + size);
    }
    out.push_back(std::move(b));
    off += size_t(size);
  }
  return true;
}

void serialize(const Box& b, std::vector<uint8_t>& out);

size_t serialized_size(const Box& b) {
  size_t n = 8;
  if (b.container)
    for (const Box& c : b.children) n += serialized_size(c);
  else
    n += b.payload.size();
  return n;  // boxes we write stay < 4 GB (moov only)
}

void serialize(const Box& b, std::vector<uint8_t>& out) {
  wr32(out, uint32_t(serialized_size(b)));
  out.push_back(uint8_t(b.type >> 24));
  out.push_back(uint8_t(b.type >> 16));
  out.push_back(uint8_t(b.type >> 8));
  out.push_back(uint8_t(b.type));
  if (b.container)
    for (const Box& c : b.children) serialize(c, out);
  else
    out.insert(out.end(), b.payload.begin(), b.payload.end());
}

Box* find_child(Box& b, const char* t) {
  uint32_t f = fourcc(t);
  for (Box& c : b.children)
    if (c.type == f) return &c;
  return nullptr;
}

// ---------------------------------------------------------------------------
// sample tables
// ---------------------------------------------------------------------------

struct SampleTable {
  uint32_t timescale = 0;
  bool video = false;
  std::vector<uint64_t> dts;      // per sample, track timescale
  std::vector<uint32_t> delta;    // per sample
  std::vector<int64_t> ctts;      // per sample (empty if no ctts box)
  std::vector<uint32_t> size;     // per sample
  std::vector<uint64_t> offset;   // absolute file offset per sample
  std::vector<uint8_t> sync;      // per sample (1 if keyframe); empty = all
};

bool expand_tables(Box& trak, SampleTable& st, const Err& err) {
  Box* mdia = find_child(trak, "mdia");
  if (!mdia) {
    err.set("trak without mdia");
    return false;
  }
  Box* mdhd = find_child(*mdia, "mdhd");
  Box* hdlr = find_child(*mdia, "hdlr");
  Box* minf = find_child(*mdia, "minf");
  if (!mdhd || !minf || mdhd->payload.size() < 20) {
    err.set("trak missing mdhd/minf");
    return false;
  }
  const uint8_t* mp = mdhd->payload.data();
  st.timescale = (mp[0] == 1) ? rd32(mp + 20) : rd32(mp + 12);
  if (st.timescale == 0) {
    err.set("zero mdhd timescale");
    return false;
  }
  st.video = hdlr && hdlr->payload.size() >= 12 &&
             rd32(hdlr->payload.data() + 8) == fourcc("vide");

  Box* stbl = find_child(*minf, "stbl");
  if (!stbl) {
    err.set("trak without stbl");
    return false;
  }
  Box* stsd = find_child(*stbl, "stsd");
  if (stsd && stsd->payload.size() >= 8 && rd32(stsd->payload.data() + 4) > 1) {
    err.set("multiple sample descriptions unsupported");
    return false;
  }
  Box* stts = find_child(*stbl, "stts");
  Box* stsz = find_child(*stbl, "stsz");
  Box* stsc = find_child(*stbl, "stsc");
  Box* stco = find_child(*stbl, "stco");
  Box* co64 = find_child(*stbl, "co64");
  if (!stts || !stsz || !stsc || (!stco && !co64)) {
    err.set("incomplete sample tables (fragmented mp4?)");
    return false;
  }

  const size_t kMaxSamples = 50u << 20;

  // stts -> per-sample dts/delta
  {
    const uint8_t* p = stts->payload.data();
    size_t n = stts->payload.size();
    if (n < 8) {
      err.set("bad stts");
      return false;
    }
    uint32_t entries = rd32(p + 4);
    if (n < 8 + size_t(entries) * 8) {
      err.set("bad stts");
      return false;
    }
    uint64_t t = 0;
    for (uint32_t i = 0; i < entries; i++) {
      uint32_t cnt = rd32(p + 8 + i * 8);
      uint32_t dt = rd32(p + 12 + i * 8);
      if (st.dts.size() + cnt > kMaxSamples) {
        err.set("too many samples");
        return false;
      }
      for (uint32_t k = 0; k < cnt; k++) {
        st.dts.push_back(t);
        st.delta.push_back(dt);
        t += dt;
      }
    }
  }
  size_t ns = st.dts.size();

  // stsz -> sizes
  {
    const uint8_t* p = stsz->payload.data();
    size_t n = stsz->payload.size();
    if (n < 12) {
      err.set("bad stsz");
      return false;
    }
    uint32_t fixed = rd32(p + 4);
    uint32_t cnt = rd32(p + 8);
    if (cnt != ns) {
      err.set("stsz/stts sample count mismatch");
      return false;
    }
    if (fixed) {
      st.size.assign(ns, fixed);
    } else {
      if (n < 12 + size_t(cnt) * 4) {
        err.set("bad stsz");
        return false;
      }
      for (uint32_t i = 0; i < cnt; i++) st.size.push_back(rd32(p + 12 + i * 4));
    }
  }

  // ctts -> per-sample composition offsets
  if (Box* ctts = find_child(*stbl, "ctts")) {
    const uint8_t* p = ctts->payload.data();
    size_t n = ctts->payload.size();
    if (n >= 8) {
      uint32_t entries = rd32(p + 4);
      if (n >= 8 + size_t(entries) * 8) {
        for (uint32_t i = 0; i < entries && st.ctts.size() < ns; i++) {
          uint32_t cnt = rd32(p + 8 + i * 8);
          int64_t off = int32_t(rd32(p + 12 + i * 8));  // signed in v1
          for (uint32_t k = 0; k < cnt && st.ctts.size() < ns; k++)
            st.ctts.push_back(off);
        }
      }
    }
    if (st.ctts.size() != ns) {
      err.set("bad ctts");
      return false;
    }
  }

  // stsc + stco/co64 -> absolute offsets
  {
    std::vector<uint64_t> chunk_off;
    const Box* cb = co64 ? co64 : stco;
    const uint8_t* p = cb->payload.data();
    size_t n = cb->payload.size();
    if (n < 8) {
      err.set("bad stco");
      return false;
    }
    uint32_t cnt = rd32(p + 4);
    size_t w = co64 ? 8 : 4;
    if (n < 8 + size_t(cnt) * w) {
      err.set("bad stco");
      return false;
    }
    for (uint32_t i = 0; i < cnt; i++)
      chunk_off.push_back(co64 ? rd64(p + 8 + i * 8) : rd32(p + 8 + i * 4));

    const uint8_t* sp = stsc->payload.data();
    size_t sn = stsc->payload.size();
    if (sn < 8) {
      err.set("bad stsc");
      return false;
    }
    uint32_t se = rd32(sp + 4);
    if (sn < 8 + size_t(se) * 12) {
      err.set("bad stsc");
      return false;
    }
    st.offset.reserve(ns);
    size_t sample = 0;
    for (uint32_t e = 0; e < se && sample < ns; e++) {
      uint32_t first = rd32(sp + 8 + e * 12);
      uint32_t per = rd32(sp + 12 + e * 12);
      uint32_t next_first = (e + 1 < se) ? rd32(sp + 20 + e * 12)
                                         : uint32_t(chunk_off.size() + 1);
      if (first == 0 || first > chunk_off.size() || per == 0) {
        err.set("bad stsc entry");
        return false;
      }
      for (uint32_t c = first; c < next_first && sample < ns; c++) {
        if (c > chunk_off.size()) break;
        uint64_t off = chunk_off[c - 1];
        for (uint32_t k = 0; k < per && sample < ns; k++) {
          st.offset.push_back(off);
          off += st.size[sample];
          sample++;
        }
      }
    }
    if (st.offset.size() != ns) {
      err.set("stsc/stco do not cover all samples");
      return false;
    }
  }

  // stss -> sync flags
  if (Box* stss = find_child(*stbl, "stss")) {
    const uint8_t* p = stss->payload.data();
    size_t n = stss->payload.size();
    if (n < 8) {
      err.set("bad stss");
      return false;
    }
    uint32_t cnt = rd32(p + 4);
    if (n < 8 + size_t(cnt) * 4) {
      err.set("bad stss");
      return false;
    }
    st.sync.assign(ns, 0);
    for (uint32_t i = 0; i < cnt; i++) {
      uint32_t s = rd32(p + 8 + i * 4);
      if (s >= 1 && s <= ns) st.sync[s - 1] = 1;
    }
  }
  return true;
}

// run-length encode (count, value) pairs for stts/ctts
template <typename T>
std::vector<std::pair<uint32_t, T>> rle(const std::vector<T>& v) {
  std::vector<std::pair<uint32_t, T>> out;
  for (const T& x : v) {
    if (!out.empty() && out.back().second == x)
      out.back().first++;
    else
      out.push_back({1, x});
  }
  return out;
}

void set_duration(Box* b, uint64_t dur, int off_v0, int off_v1) {
  if (!b || b->payload.empty()) return;
  uint8_t* p = b->payload.data();
  if (p[0] == 1) {
    if (b->payload.size() >= size_t(off_v1) + 8) {
      std::vector<uint8_t> tmp;
      wr64(tmp, dur);
      memcpy(p + off_v1, tmp.data(), 8);
    }
  } else {
    if (b->payload.size() >= size_t(off_v0) + 4) {
      uint32_t d32 = dur > 0xffffffffu ? 0xffffffffu : uint32_t(dur);
      std::vector<uint8_t> tmp;
      wr32(tmp, d32);
      memcpy(p + off_v0, tmp.data(), 4);
    }
  }
}

struct Selection {
  SampleTable st;
  size_t first = 0, count = 0;
  Box* trak = nullptr;
  uint64_t data_bytes = 0;
  uint64_t out_chunk_offset = 0;  // filled once layout is known
};

}  // namespace

extern "C" int v3d_mp4_cut(const char* in_path, const char* out_path,
                           double start_s, double dur_s, char* errbuf,
                           int errlen) {
  Err err{errbuf, errlen};
  if (dur_s <= 0 || start_s < 0) {
    err.set("invalid window");
    return -1;
  }
  FILE* f = fopen(in_path, "rb");
  if (!f) {
    err.set(std::string("cannot open ") + in_path);
    return -1;
  }

  // top-level scan: keep ftyp bytes, load moov, note nothing else
  std::vector<uint8_t> ftyp;
  std::vector<uint8_t> moov_raw;
  {
    uint8_t hdr[16];
    uint64_t off = 0;
    for (;;) {
      if (seek64(f, off) != 0) break;
      if (fread(hdr, 1, 8, f) != 8) break;
      uint64_t size = rd32(hdr);
      uint32_t type = rd32(hdr + 4);
      size_t h = 8;
      if (size == 1) {
        if (fread(hdr + 8, 1, 8, f) != 8) break;
        size = rd64(hdr + 8);
        h = 16;
      } else if (size == 0) {
        fseek(f, 0, SEEK_END);
        size = uint64_t(tell64(f)) - off;
        seek64(f, off + h);
      }
      if (size < h) break;
      if (type == fourcc("ftyp") && size <= (1u << 20)) {
        ftyp.resize(size_t(size));
        seek64(f, off);
        if (fread(ftyp.data(), 1, size_t(size), f) != size_t(size)) {
          err.set("short read on ftyp");
          fclose(f);
          return -1;
        }
      } else if (type == fourcc("moov")) {
        if (size > (512u << 20)) {
          err.set("moov too large");
          fclose(f);
          return -1;
        }
        moov_raw.resize(size_t(size - h));
        seek64(f, off + h);
        if (fread(moov_raw.data(), 1, moov_raw.size(), f) != moov_raw.size()) {
          err.set("short read on moov");
          fclose(f);
          return -1;
        }
      }
      off += size;
    }
  }
  if (moov_raw.empty()) {
    err.set("no moov box (not an MP4, or fragmented)");
    fclose(f);
    return -1;
  }

  Box moov;
  moov.type = fourcc("moov");
  moov.container = true;
  if (!parse_children(moov_raw.data(), moov_raw.size(), moov.children, err,
                      0)) {
    fclose(f);
    return -1;
  }
  moov_raw.clear();
  moov_raw.shrink_to_fit();

  Box* mvhd = find_child(moov, "mvhd");
  if (!mvhd || mvhd->payload.size() < 20) {
    err.set("missing mvhd");
    fclose(f);
    return -1;
  }
  uint32_t movie_ts = (mvhd->payload[0] == 1) ? rd32(mvhd->payload.data() + 20)
                                              : rd32(mvhd->payload.data() + 12);
  if (movie_ts == 0) {
    err.set("zero movie timescale");
    fclose(f);
    return -1;
  }

  std::vector<Selection> sels;
  for (Box& c : moov.children) {
    if (c.type != fourcc("trak")) continue;
    Selection sel;
    sel.trak = &c;
    if (!expand_tables(c, sel.st, err)) {
      fclose(f);
      return -1;
    }
    if (sel.st.dts.empty()) {
      err.set("empty track");
      fclose(f);
      return -1;
    }
    sels.push_back(std::move(sel));
  }
  if (sels.empty()) {
    err.set("no tracks");
    fclose(f);
    return -1;
  }

  // snap the cut to the video track's previous keyframe (ffmpeg -ss
  // stream-copy semantics); audio and other tracks cut at that time
  double cut_s = start_s;
  for (Selection& sel : sels) {
    if (!sel.st.video) continue;
    const SampleTable& st = sel.st;
    uint64_t want = uint64_t(start_s * st.timescale);
    if (want >= st.dts.back() + st.delta.back())
      break;  // window starts past the end: don't clamp into the file
    size_t idx = 0;
    for (size_t i = 0; i < st.dts.size(); i++)
      if (st.dts[i] <= want) idx = i;
    if (!st.sync.empty())
      while (idx > 0 && !st.sync[idx]) idx--;
    cut_s = double(st.dts[idx]) / st.timescale;
    break;  // first video track decides
  }
  // Window contract: [snapped keyframe, start_s + dur_s). This differs
  // slightly from `ffmpeg -ss .. -t ..`, which counts -t from the seek
  // (keyframe) point, so our output can run longer by the keyframe
  // lead-in. For aligned extraction that is the preferable behavior:
  // the caller's requested [start, start+dur) range is always fully
  // covered rather than truncated by the lead-in.
  double end_s = start_s + dur_s;

  for (Selection& sel : sels) {
    const SampleTable& st = sel.st;
    uint64_t t0 = uint64_t(cut_s * st.timescale + 0.5);
    uint64_t t1 = uint64_t(end_s * st.timescale + 0.5);
    size_t first = st.dts.size(), last = 0;
    for (size_t i = 0; i < st.dts.size(); i++) {
      if (st.dts[i] >= t0 && first == st.dts.size()) first = i;
      if (st.dts[i] < t1) last = i;
    }
    // video: make sure we start on the snapped keyframe itself
    if (st.video && first < st.dts.size() && !st.sync.empty())
      while (first > 0 && !st.sync[first]) first--;
    if (first == st.dts.size() || last < first) {
      err.set("window selects no samples");
      fclose(f);
      return -1;
    }
    sel.first = first;
    sel.count = last - first + 1;
    for (size_t i = first; i <= last; i++) sel.data_bytes += st.size[i];
  }

  // rebuild each trak's sample tables; compute durations
  uint64_t movie_dur = 0;
  for (Selection& sel : sels) {
    SampleTable& st = sel.st;
    size_t a = sel.first, n = sel.count;

    std::vector<uint32_t> deltas(st.delta.begin() + a,
                                 st.delta.begin() + a + n);
    uint64_t tdur = 0;
    for (uint32_t d : deltas) tdur += d;
    uint64_t mdur = tdur * movie_ts / st.timescale;
    if (mdur > movie_dur) movie_dur = mdur;

    Box* mdia = find_child(*sel.trak, "mdia");
    Box* minf = find_child(*mdia, "minf");
    Box* stbl = find_child(*minf, "stbl");

    std::vector<Box> nb;  // new stbl children
    for (Box& c : stbl->children) {
      uint32_t t = c.type;
      if (t == fourcc("stts")) {
        Box b;
        b.type = t;
        auto runs = rle(deltas);
        wr32(b.payload, 0);
        wr32(b.payload, uint32_t(runs.size()));
        for (auto& r : runs) {
          wr32(b.payload, r.first);
          wr32(b.payload, r.second);
        }
        nb.push_back(std::move(b));
      } else if (t == fourcc("ctts")) {
        Box b;
        b.type = t;
        std::vector<int64_t> cofs(st.ctts.begin() + a,
                                  st.ctts.begin() + a + n);
        auto runs = rle(cofs);
        b.payload.push_back(1);  // version 1: signed offsets
        b.payload.push_back(0);
        b.payload.push_back(0);
        b.payload.push_back(0);
        wr32(b.payload, uint32_t(runs.size()));
        for (auto& r : runs) {
          wr32(b.payload, r.first);
          wr32(b.payload, uint32_t(int32_t(r.second)));
        }
        nb.push_back(std::move(b));
      } else if (t == fourcc("stss")) {
        if (st.sync.empty()) continue;
        Box b;
        b.type = t;
        std::vector<uint32_t> syncs;
        for (size_t i = 0; i < n; i++)
          if (st.sync[a + i]) syncs.push_back(uint32_t(i + 1));
        wr32(b.payload, 0);
        wr32(b.payload, uint32_t(syncs.size()));
        for (uint32_t s : syncs) wr32(b.payload, s);
        nb.push_back(std::move(b));
      } else if (t == fourcc("stsc")) {
        Box b;
        b.type = t;
        wr32(b.payload, 0);
        wr32(b.payload, 1);  // one chunk holding every sample
        wr32(b.payload, 1);
        wr32(b.payload, uint32_t(n));
        wr32(b.payload, 1);
        nb.push_back(std::move(b));
      } else if (t == fourcc("stsz")) {
        Box b;
        b.type = t;
        wr32(b.payload, 0);
        wr32(b.payload, 0);  // per-sample sizes
        wr32(b.payload, uint32_t(n));
        for (size_t i = 0; i < n; i++) wr32(b.payload, st.size[a + i]);
        nb.push_back(std::move(b));
      } else if (t == fourcc("stco") || t == fourcc("co64")) {
        Box b;
        b.type = fourcc("co64");  // placeholder; patched after layout
        wr32(b.payload, 0);
        wr32(b.payload, 1);
        wr64(b.payload, 0);
        nb.push_back(std::move(b));
      } else {
        nb.push_back(std::move(c));  // stsd and friends: verbatim
      }
    }
    stbl->children = std::move(nb);

    // durations + drop edit lists (output timeline starts at 0)
    set_duration(find_child(*mdia, "mdhd"), tdur, 16, 24);
    set_duration(find_child(*sel.trak, "tkhd"), mdur, 20, 28);
    for (size_t i = 0; i < sel.trak->children.size(); i++)
      if (sel.trak->children[i].type == fourcc("edts")) {
        sel.trak->children.erase(sel.trak->children.begin() + long(i));
        break;
      }
  }
  set_duration(mvhd, movie_dur, 16, 24);

  // layout: [ftyp][moov][mdat hdr][track0 samples][track1 samples]...
  uint64_t mdat_payload = 0;
  for (Selection& sel : sels) mdat_payload += sel.data_bytes;
  size_t moov_size = serialized_size(moov);
  uint64_t mdat_hdr = (mdat_payload + 8 > 0xffffffffu) ? 16 : 8;
  uint64_t data_start = ftyp.size() + moov_size + mdat_hdr;
  uint64_t cursor = data_start;
  for (Selection& sel : sels) {
    sel.out_chunk_offset = cursor;
    cursor += sel.data_bytes;
  }

  // patch the co64 placeholders with real offsets
  for (Selection& sel : sels) {
    Box* stbl = find_child(*find_child(*find_child(*sel.trak, "mdia"), "minf"),
                           "stbl");
    Box* co = find_child(*stbl, "co64");
    co->payload.clear();
    wr32(co->payload, 0);
    wr32(co->payload, 1);
    wr64(co->payload, sel.out_chunk_offset);
  }

  std::vector<uint8_t> moov_bytes;
  serialize(moov, moov_bytes);
  if (moov_bytes.size() != moov_size) {
    err.set("internal: moov size changed after offset patch");
    fclose(f);
    return -1;
  }

  FILE* o = fopen(out_path, "wb");
  if (!o) {
    err.set(std::string("cannot create ") + out_path);
    fclose(f);
    return -1;
  }
  bool ok = true;
  ok = ok && (ftyp.empty() ||
              fwrite(ftyp.data(), 1, ftyp.size(), o) == ftyp.size());
  ok = ok &&
       fwrite(moov_bytes.data(), 1, moov_bytes.size(), o) == moov_bytes.size();
  {
    std::vector<uint8_t> h;
    if (mdat_hdr == 16) {
      wr32(h, 1);
      wrtype(h, "mdat");
      wr64(h, mdat_payload + 16);
    } else {
      wr32(h, uint32_t(mdat_payload + 8));
      wrtype(h, "mdat");
    }
    ok = ok && fwrite(h.data(), 1, h.size(), o) == h.size();
  }
  std::vector<uint8_t> buf(1 << 20);
  for (Selection& sel : sels) {
    const SampleTable& st = sel.st;
    for (size_t i = sel.first; ok && i < sel.first + sel.count; i++) {
      if (seek64(f, st.offset[i]) != 0) {
        ok = false;
        break;
      }
      size_t left = st.size[i];
      while (left > 0) {
        size_t chunk = left < buf.size() ? left : buf.size();
        if (fread(buf.data(), 1, chunk, f) != chunk ||
            fwrite(buf.data(), 1, chunk, o) != chunk) {
          ok = false;
          break;
        }
        left -= chunk;
      }
    }
  }
  fclose(f);
  fclose(o);
  if (!ok) {
    err.set("I/O error while copying samples");
    remove(out_path);
    return -1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Box-level stream-copy concat: join same-codec MP4 segments without
// re-encoding. The segment-parallel encoder (core/video.py
// SegmentParallelVideoWriter) writes N independent segments -- one x264
// worker per frame range -- and this stitches them into one file: sample
// tables are merged (stts/ctts/stss/stsz rebuilt over the concatenated
// sample runs), sample bytes are copied verbatim, and every input must
// carry byte-identical stsd entries (same codec config) per track.
//
//   v3d_mp4_concat(in_paths, n_in, out, err, errlen) -> 0 ok, -1 error
// ---------------------------------------------------------------------------

namespace {

struct InputTrack {
  SampleTable st;
  std::vector<uint8_t> stsd;  // raw stsd payload for compat check
};

// Same-codec check across segments. Byte-identical stsd is ideal, but
// some encoders (cv2's mp4v/esds) embed content-dependent bitrate
// stats, so fall back to comparing what actually governs decode: the
// sample-entry format fourcc, video dimensions, and -- when present --
// the full avcC decoder configuration.
bool stsd_compatible(const std::vector<uint8_t>& a,
                     const std::vector<uint8_t>& b, bool video) {
  if (a == b) return true;
  // payload: version/flags(4) entry_count(4) entry{size(4) fourcc(4) ...}
  if (a.size() < 16 || b.size() < 16) return false;
  if (memcmp(a.data() + 12, b.data() + 12, 4) != 0) return false;  // fourcc
  if (video) {
    // video sample entry: width/height at entry offset 32 -> payload 40
    if (a.size() < 44 || b.size() < 44) return false;
    if (memcmp(a.data() + 40, b.data() + 40, 4) != 0) return false;
  }
  // if both carry an avcC (H.264 decoder config), require it identical
  auto find_avcc = [](const std::vector<uint8_t>& v) -> std::pair<size_t, size_t> {
    for (size_t i = 0; i + 8 <= v.size(); i++) {
      if (v[i + 4] == 'a' && v[i + 5] == 'v' && v[i + 6] == 'c' &&
          v[i + 7] == 'C') {
        uint64_t sz = rd32(v.data() + i);
        if (sz >= 8 && i + sz <= v.size()) return {i, size_t(sz)};
      }
    }
    return {0, 0};
  };
  auto pa = find_avcc(a), pb = find_avcc(b);
  if (pa.second != pb.second) return false;
  if (pa.second &&
      memcmp(a.data() + pa.first, b.data() + pb.first, pa.second) != 0)
    return false;
  return true;
}

struct InputFile {
  FILE* f = nullptr;
  std::vector<uint8_t> ftyp;
  Box moov;
  std::vector<Box*> traks;
  std::vector<InputTrack> tracks;
};

bool scan_top_level(FILE* f, std::vector<uint8_t>& ftyp,
                    std::vector<uint8_t>& moov_raw, const Err& err) {
  uint8_t hdr[16];
  uint64_t off = 0;
  for (;;) {
    if (seek64(f, off) != 0) break;
    if (fread(hdr, 1, 8, f) != 8) break;
    uint64_t size = rd32(hdr);
    uint32_t type = rd32(hdr + 4);
    size_t h = 8;
    if (size == 1) {
      if (fread(hdr + 8, 1, 8, f) != 8) break;
      size = rd64(hdr + 8);
      h = 16;
    } else if (size == 0) {
      fseek(f, 0, SEEK_END);
      size = uint64_t(tell64(f)) - off;
      seek64(f, off + h);
    }
    if (size < h) break;
    if (type == fourcc("ftyp") && size <= (1u << 20)) {
      ftyp.resize(size_t(size));
      seek64(f, off);
      if (fread(ftyp.data(), 1, size_t(size), f) != size_t(size)) {
        err.set("short read on ftyp");
        return false;
      }
    } else if (type == fourcc("moov")) {
      if (size > (512u << 20)) {
        err.set("moov too large");
        return false;
      }
      moov_raw.resize(size_t(size - h));
      seek64(f, off + h);
      if (fread(moov_raw.data(), 1, moov_raw.size(), f) != moov_raw.size()) {
        err.set("short read on moov");
        return false;
      }
    }
    off += size;
  }
  return !moov_raw.empty();
}

bool load_input(const char* path, InputFile& in, const Err& err) {
  in.f = fopen(path, "rb");
  if (!in.f) {
    err.set(std::string("cannot open ") + path);
    return false;
  }
  std::vector<uint8_t> moov_raw;
  if (!scan_top_level(in.f, in.ftyp, moov_raw, err)) {
    if (moov_raw.empty()) err.set(std::string(path) + ": no moov box");
    return false;
  }
  in.moov.type = fourcc("moov");
  in.moov.container = true;
  if (!parse_children(moov_raw.data(), moov_raw.size(), in.moov.children,
                      err, 0))
    return false;
  for (Box& c : in.moov.children) {
    if (c.type != fourcc("trak")) continue;
    InputTrack t;
    if (!expand_tables(c, t.st, err)) return false;
    if (t.st.dts.empty()) {
      err.set(std::string(path) + ": empty track");
      return false;
    }
    Box* stbl = find_child(*find_child(*find_child(c, "mdia"), "minf"),
                           "stbl");
    Box* stsd = find_child(*stbl, "stsd");
    if (stsd) t.stsd = stsd->payload;
    in.traks.push_back(&c);
    in.tracks.push_back(std::move(t));
  }
  if (in.tracks.empty()) {
    err.set(std::string(path) + ": no tracks");
    return false;
  }
  return true;
}

}  // namespace

extern "C" int v3d_mp4_concat(const char* const* in_paths, int n_in,
                              const char* out_path, char* errbuf,
                              int errlen) {
  Err err{errbuf, errlen};
  if (n_in < 1) {
    err.set("need at least one input");
    return -1;
  }
  std::vector<InputFile> ins{size_t(n_in)};
  auto cleanup = [&]() {
    for (InputFile& in : ins)
      if (in.f) fclose(in.f);
  };
  for (int i = 0; i < n_in; i++)
    if (!load_input(in_paths[i], ins[size_t(i)], err)) {
      cleanup();
      return -1;
    }

  size_t n_tracks = ins[0].tracks.size();
  for (int i = 1; i < n_in; i++) {
    if (ins[size_t(i)].tracks.size() != n_tracks) {
      err.set("inputs have different track counts");
      cleanup();
      return -1;
    }
    for (size_t t = 0; t < n_tracks; t++) {
      const InputTrack& a = ins[0].tracks[t];
      const InputTrack& b = ins[size_t(i)].tracks[t];
      if (a.st.timescale != b.st.timescale || a.st.video != b.st.video ||
          !stsd_compatible(a.stsd, b.stsd, a.st.video)) {
        err.set("inputs are not codec-compatible (stsd/timescale differ)");
        cleanup();
        return -1;
      }
    }
  }

  Box& moov = ins[0].moov;  // template: first input's tree
  Box* mvhd = find_child(moov, "mvhd");
  if (!mvhd || mvhd->payload.size() < 20) {
    err.set("missing mvhd");
    cleanup();
    return -1;
  }
  uint32_t movie_ts = (mvhd->payload[0] == 1)
                          ? rd32(mvhd->payload.data() + 20)
                          : rd32(mvhd->payload.data() + 12);
  if (movie_ts == 0) {
    err.set("zero movie timescale");
    cleanup();
    return -1;
  }

  // merged per-track data
  struct OutTrack {
    std::vector<uint32_t> delta;
    std::vector<int64_t> ctts;
    std::vector<uint32_t> size;
    std::vector<uint8_t> sync;
    bool any_ctts = false, any_stss = false;
    uint64_t data_bytes = 0;
    uint64_t out_chunk_offset = 0;
  };
  std::vector<OutTrack> outs(n_tracks);
  for (size_t t = 0; t < n_tracks; t++) {
    OutTrack& o = outs[t];
    for (int i = 0; i < n_in; i++) {
      const SampleTable& st = ins[size_t(i)].tracks[t].st;
      if (!st.ctts.empty()) o.any_ctts = true;
      if (!st.sync.empty()) o.any_stss = true;
    }
    for (int i = 0; i < n_in; i++) {
      const SampleTable& st = ins[size_t(i)].tracks[t].st;
      size_t n = st.dts.size();
      o.delta.insert(o.delta.end(), st.delta.begin(), st.delta.end());
      for (size_t s = 0; s < n; s++) {
        o.ctts.push_back(st.ctts.empty() ? 0 : st.ctts[s]);
        o.sync.push_back(st.sync.empty() ? 1 : st.sync[s]);
        o.data_bytes += st.size[s];
      }
      o.size.insert(o.size.end(), st.size.begin(), st.size.end());
    }
  }

  // rebuild each template trak's stbl over the merged runs
  uint64_t movie_dur = 0;
  for (size_t t = 0; t < n_tracks; t++) {
    OutTrack& o = outs[t];
    Box* trak = ins[0].traks[t];
    uint32_t timescale = ins[0].tracks[t].st.timescale;
    uint64_t tdur = 0;
    for (uint32_t d : o.delta) tdur += d;
    uint64_t mdur = tdur * movie_ts / timescale;
    if (mdur > movie_dur) movie_dur = mdur;

    Box* mdia = find_child(*trak, "mdia");
    Box* minf = find_child(*mdia, "minf");
    Box* stbl = find_child(*minf, "stbl");
    size_t n = o.delta.size();

    std::vector<Box> nb;
    bool wrote_ctts = false, wrote_stss = false;
    for (Box& c : stbl->children) {
      uint32_t ty = c.type;
      if (ty == fourcc("stts")) {
        Box b;
        b.type = ty;
        auto runs = rle(o.delta);
        wr32(b.payload, 0);
        wr32(b.payload, uint32_t(runs.size()));
        for (auto& r : runs) {
          wr32(b.payload, r.first);
          wr32(b.payload, r.second);
        }
        nb.push_back(std::move(b));
      } else if (ty == fourcc("ctts")) {
        if (!o.any_ctts) continue;
        Box b;
        b.type = ty;
        auto runs = rle(o.ctts);
        b.payload.push_back(1);  // version 1: signed offsets
        b.payload.push_back(0);
        b.payload.push_back(0);
        b.payload.push_back(0);
        wr32(b.payload, uint32_t(runs.size()));
        for (auto& r : runs) {
          wr32(b.payload, r.first);
          wr32(b.payload, uint32_t(int32_t(r.second)));
        }
        nb.push_back(std::move(b));
        wrote_ctts = true;
      } else if (ty == fourcc("stss")) {
        if (!o.any_stss) continue;
        Box b;
        b.type = ty;
        std::vector<uint32_t> syncs;
        for (size_t i = 0; i < n; i++)
          if (o.sync[i]) syncs.push_back(uint32_t(i + 1));
        wr32(b.payload, 0);
        wr32(b.payload, uint32_t(syncs.size()));
        for (uint32_t s : syncs) wr32(b.payload, s);
        nb.push_back(std::move(b));
        wrote_stss = true;
      } else if (ty == fourcc("stsc")) {
        Box b;
        b.type = ty;
        wr32(b.payload, 0);
        wr32(b.payload, 1);  // one chunk holding every sample
        wr32(b.payload, 1);
        wr32(b.payload, uint32_t(n));
        wr32(b.payload, 1);
        nb.push_back(std::move(b));
      } else if (ty == fourcc("stsz")) {
        Box b;
        b.type = ty;
        wr32(b.payload, 0);
        wr32(b.payload, 0);
        wr32(b.payload, uint32_t(n));
        for (size_t i = 0; i < n; i++) wr32(b.payload, o.size[i]);
        nb.push_back(std::move(b));
      } else if (ty == fourcc("stco") || ty == fourcc("co64")) {
        Box b;
        b.type = fourcc("co64");  // placeholder; patched after layout
        wr32(b.payload, 0);
        wr32(b.payload, 1);
        wr64(b.payload, 0);
        nb.push_back(std::move(b));
      } else {
        nb.push_back(std::move(c));
      }
    }
    // a later segment may have ctts/stss where segment 0 had none
    if (o.any_ctts && !wrote_ctts) {
      Box b;
      b.type = fourcc("ctts");
      auto runs = rle(o.ctts);
      b.payload.push_back(1);
      b.payload.push_back(0);
      b.payload.push_back(0);
      b.payload.push_back(0);
      wr32(b.payload, uint32_t(runs.size()));
      for (auto& r : runs) {
        wr32(b.payload, r.first);
        wr32(b.payload, uint32_t(int32_t(r.second)));
      }
      nb.push_back(std::move(b));
    }
    if (o.any_stss && !wrote_stss) {
      Box b;
      b.type = fourcc("stss");
      std::vector<uint32_t> syncs;
      for (size_t i = 0; i < n; i++)
        if (o.sync[i]) syncs.push_back(uint32_t(i + 1));
      wr32(b.payload, 0);
      wr32(b.payload, uint32_t(syncs.size()));
      for (uint32_t s : syncs) wr32(b.payload, s);
      nb.push_back(std::move(b));
    }
    stbl->children = std::move(nb);

    set_duration(find_child(*mdia, "mdhd"), tdur, 16, 24);
    set_duration(find_child(*trak, "tkhd"), mdur, 20, 28);
    for (size_t i = 0; i < trak->children.size(); i++)
      if (trak->children[i].type == fourcc("edts")) {
        trak->children.erase(trak->children.begin() + long(i));
        break;
      }
  }
  set_duration(mvhd, movie_dur, 16, 24);

  // layout: [ftyp][moov][mdat hdr][track0: seg0..segN][track1: ...]
  uint64_t mdat_payload = 0;
  for (OutTrack& o : outs) mdat_payload += o.data_bytes;
  size_t moov_size = serialized_size(moov);
  uint64_t mdat_hdr = (mdat_payload + 8 > 0xffffffffu) ? 16 : 8;
  uint64_t cursor = ins[0].ftyp.size() + moov_size + mdat_hdr;
  for (OutTrack& o : outs) {
    o.out_chunk_offset = cursor;
    cursor += o.data_bytes;
  }
  for (size_t t = 0; t < n_tracks; t++) {
    Box* stbl = find_child(
        *find_child(*find_child(*ins[0].traks[t], "mdia"), "minf"), "stbl");
    Box* co = find_child(*stbl, "co64");
    co->payload.clear();
    wr32(co->payload, 0);
    wr32(co->payload, 1);
    wr64(co->payload, outs[t].out_chunk_offset);
  }

  std::vector<uint8_t> moov_bytes;
  serialize(moov, moov_bytes);
  if (moov_bytes.size() != moov_size) {
    err.set("internal: moov size changed after offset patch");
    cleanup();
    return -1;
  }

  FILE* o = fopen(out_path, "wb");
  if (!o) {
    err.set(std::string("cannot create ") + out_path);
    cleanup();
    return -1;
  }
  bool ok = true;
  const std::vector<uint8_t>& ftyp = ins[0].ftyp;
  ok = ok && (ftyp.empty() ||
              fwrite(ftyp.data(), 1, ftyp.size(), o) == ftyp.size());
  ok = ok &&
       fwrite(moov_bytes.data(), 1, moov_bytes.size(), o) == moov_bytes.size();
  {
    std::vector<uint8_t> h;
    if (mdat_hdr == 16) {
      wr32(h, 1);
      wrtype(h, "mdat");
      wr64(h, mdat_payload + 16);
    } else {
      wr32(h, uint32_t(mdat_payload + 8));
      wrtype(h, "mdat");
    }
    ok = ok && fwrite(h.data(), 1, h.size(), o) == h.size();
  }
  std::vector<uint8_t> buf(1 << 20);
  for (size_t t = 0; ok && t < n_tracks; t++) {
    for (int i = 0; ok && i < n_in; i++) {
      InputFile& in = ins[size_t(i)];
      const SampleTable& st = in.tracks[t].st;
      for (size_t s = 0; ok && s < st.offset.size(); s++) {
        if (seek64(in.f, st.offset[s]) != 0) {
          ok = false;
          break;
        }
        size_t left = st.size[s];
        while (left > 0) {
          size_t chunk = left < buf.size() ? left : buf.size();
          if (fread(buf.data(), 1, chunk, in.f) != chunk ||
              fwrite(buf.data(), 1, chunk, o) != chunk) {
            ok = false;
            break;
          }
          left -= chunk;
        }
      }
    }
  }
  cleanup();
  fclose(o);
  if (!ok) {
    err.set("I/O error while copying samples");
    remove(out_path);
    return -1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// PCM audio track extraction (ffmpeg-less alignment support)
//
// Real containers usually carry AAC, which still needs ffmpeg; but
// uncompressed tracks (QuickTime 'sowt'/'twos'/'raw '/'lpcm'-v0 and
// ISO-BMFF 'ipcm') decode trivially: the sample bytes ARE the PCM. This
// closes the ffmpeg dependency for alignment on such files (reference
// always shells out to ffmpeg, utils.py:41-120). Output: 16-bit LE WAV.

namespace {

bool write_wav_header(FILE* out, uint32_t data_bytes, uint32_t rate,
                      uint16_t channels) {
  std::vector<uint8_t> h;
  wrtype(h, "RIFF");
  wr32(h, 0);  // placeholder, patched little-endian below
  wrtype(h, "WAVE");
  wrtype(h, "fmt ");
  // little-endian fields: write manually
  auto le16 = [&](uint16_t x) {
    h.push_back(uint8_t(x & 0xff));
    h.push_back(uint8_t(x >> 8));
  };
  auto le32 = [&](uint32_t x) {
    for (int i = 0; i < 4; i++) h.push_back(uint8_t((x >> (8 * i)) & 0xff));
  };
  le32(16);
  le16(1);  // PCM
  le16(channels);
  le32(rate);
  le32(rate * channels * 2);
  le16(uint16_t(channels * 2));
  le16(16);
  wrtype(h, "data");
  le32(data_bytes);
  // patch RIFF size (little-endian)
  uint32_t riff = 36 + data_bytes;
  for (int i = 0; i < 4; i++) h[4 + i] = uint8_t((riff >> (8 * i)) & 0xff);
  return fwrite(h.data(), 1, h.size(), out) == h.size();
}

}  // namespace

extern "C" int v3d_mp4_extract_pcm(const char* in_path, const char* out_path,
                                   char* errbuf, int errlen) {
  Err err{errbuf, errlen};
  FILE* f = fopen(in_path, "rb");
  if (!f) {
    err.set(std::string("cannot open ") + in_path);
    return -1;
  }
  std::vector<uint8_t> moov_raw;
  {
    uint8_t hdr[16];
    uint64_t off = 0;
    for (;;) {
      if (seek64(f, off) != 0) break;
      if (fread(hdr, 1, 8, f) != 8) break;
      uint64_t size = rd32(hdr);
      uint32_t type = rd32(hdr + 4);
      size_t h = 8;
      if (size == 1) {
        if (fread(hdr + 8, 1, 8, f) != 8) break;
        size = rd64(hdr + 8);
        h = 16;
      } else if (size == 0) {
        fseek(f, 0, SEEK_END);
        size = uint64_t(tell64(f)) - off;
      }
      if (size < h) break;
      if (type == fourcc("moov")) {
        moov_raw.resize(size_t(size - h));
        if (seek64(f, off + h) != 0 ||
            fread(moov_raw.data(), 1, moov_raw.size(), f) !=
                moov_raw.size()) {
          err.set("cannot read moov");
          fclose(f);
          return -1;
        }
      }
      off += size;
    }
  }
  if (moov_raw.empty()) {
    err.set("no moov box (fragmented mp4?)");
    fclose(f);
    return -1;
  }
  std::vector<Box> moov;
  if (!parse_children(moov_raw.data(), moov_raw.size(), moov, err, 0)) {
    fclose(f);
    return -1;
  }

  for (Box& top : moov) {
    if (top.type != fourcc("trak")) continue;
    SampleTable st;
    if (!expand_tables(top, st, err)) {
      fclose(f);
      return -1;
    }
    if (st.video || st.size.empty()) continue;
    Box* mdia = find_child(top, "mdia");
    Box* minf = mdia ? find_child(*mdia, "minf") : nullptr;
    Box* stbl = minf ? find_child(*minf, "stbl") : nullptr;
    Box* stsd = stbl ? find_child(*stbl, "stsd") : nullptr;
    if (!stsd || stsd->payload.size() < 16 + 28) continue;
    const uint8_t* e = stsd->payload.data() + 8;  // first sample entry
    size_t elen = stsd->payload.size() - 8;
    uint32_t codec = rd32(e + 4);
    bool sowt = codec == fourcc("sowt") || codec == fourcc("ipcm");
    bool twos = codec == fourcc("twos") || codec == fourcc("lpcm");
    bool raw8 = codec == fourcc("raw ");
    if (!sowt && !twos && !raw8) continue;  // compressed: not our job
    if (elen < 36) continue;
    uint16_t channels = uint16_t((e[24] << 8) | e[25]);
    uint16_t bits = uint16_t((e[26] << 8) | e[27]);
    uint32_t rate = rd32(e + 32) >> 16;  // 16.16 fixed
    if (rate == 0) rate = st.timescale;
    if (channels == 0 || channels > 8) continue;
    if (bits != 16 && bits != 8) continue;
    if (raw8 && bits != 8) continue;

    FILE* out = fopen(out_path, "wb");
    if (!out) {
      err.set(std::string("cannot open ") + out_path);
      fclose(f);
      return -1;
    }
    uint64_t total_in = 0;
    for (uint32_t s : st.size) total_in += s;
    uint64_t out_bytes = (bits == 8) ? total_in * 2 : total_in;
    if (out_bytes > 0xffffffffull - 44) out_bytes = 0xffffffffull - 44;
    if (!write_wav_header(out, uint32_t(out_bytes), rate, channels)) {
      err.set("wav header write failed");
      fclose(out);
      fclose(f);
      return -1;
    }
    std::vector<uint8_t> buf;
    uint64_t written = 0;
    for (size_t i = 0; i < st.size.size() && written < out_bytes; i++) {
      buf.resize(st.size[i]);
      if (seek64(f, st.offset[i]) != 0 ||
          fread(buf.data(), 1, buf.size(), f) != buf.size()) {
        err.set("sample read failed");
        fclose(out);
        fclose(f);
        return -1;
      }
      std::vector<uint8_t> conv;
      const std::vector<uint8_t>* w = &buf;
      if (bits == 16 && twos) {  // big-endian/lpcm-BE -> LE
        conv.resize(buf.size());
        for (size_t k = 0; k + 1 < buf.size(); k += 2) {
          conv[k] = buf[k + 1];
          conv[k + 1] = buf[k];
        }
        w = &conv;
      } else if (bits == 8) {  // widen to 16-bit LE
        conv.resize(buf.size() * 2);
        for (size_t k = 0; k < buf.size(); k++) {
          // 'raw ' is unsigned 8-bit; 'twos' 8-bit is signed
          int v = raw8 ? (int(buf[k]) - 128) << 8 : int(int8_t(buf[k])) << 8;
          conv[2 * k] = uint8_t(uint16_t(v) & 0xff);
          conv[2 * k + 1] = uint8_t(uint16_t(v) >> 8);
        }
        w = &conv;
      }
      size_t n = size_t(std::min<uint64_t>(w->size(), out_bytes - written));
      if (fwrite(w->data(), 1, n, out) != n) {
        err.set("wav write failed");
        fclose(out);
        fclose(f);
        return -1;
      }
      written += n;
    }
    fclose(out);
    fclose(f);
    return 0;
  }
  err.set("no uncompressed PCM audio track (AAC et al. need ffmpeg)");
  fclose(f);
  return -2;
}
