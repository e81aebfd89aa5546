#include "wav_io.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>

namespace qtts {
namespace {

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}

constexpr uint16_t kFmtPcm = 1;
constexpr uint16_t kFmtFloat = 3;
constexpr uint16_t kFmtExtensible = 0xFFFE;

}  // namespace

bool read_wav(const std::string& path, WavData* out, std::string* error) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    if (error) *error = "cannot open: " + path;
    return false;
  }
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                           std::istreambuf_iterator<char>());
  if (buf.size() < 12 || std::memcmp(buf.data(), "RIFF", 4) != 0 ||
      std::memcmp(buf.data() + 8, "WAVE", 4) != 0) {
    if (error) *error = "not a RIFF/WAVE file: " + path;
    return false;
  }

  uint16_t fmt_tag = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const uint8_t* data_ptr = nullptr;
  size_t data_len = 0;
  bool have_fmt = false;

  // Chunk walk; unknown chunks skipped (word-aligned), like the reference's
  // chunked parser (wav_reader.cpp:28-143).
  size_t pos = 12;
  while (pos + 8 <= buf.size()) {
    const char* tag = reinterpret_cast<const char*>(buf.data() + pos);
    const uint32_t len = rd_u32(buf.data() + pos + 4);
    const size_t body = pos + 8;
    if (body + len > buf.size() && std::memcmp(tag, "data", 4) != 0) break;
    if (std::memcmp(tag, "fmt ", 4) == 0 && len >= 16) {
      fmt_tag = rd_u16(buf.data() + body);
      channels = rd_u16(buf.data() + body + 2);
      sample_rate = rd_u32(buf.data() + body + 4);
      bits = rd_u16(buf.data() + body + 14);
      if (fmt_tag == kFmtExtensible && len >= 40) {
        // first 2 bytes of the GUID sub-format carry the real tag
        fmt_tag = rd_u16(buf.data() + body + 24);
      }
      have_fmt = true;
    } else if (std::memcmp(tag, "data", 4) == 0) {
      data_ptr = buf.data() + body;
      data_len = std::min<size_t>(len, buf.size() - body);
    }
    pos = body + len + (len & 1);  // chunks are word-aligned
  }

  if (!have_fmt || data_ptr == nullptr) {
    if (error) *error = "missing fmt/data chunk: " + path;
    return false;
  }
  if (channels == 0 || sample_rate == 0) {
    if (error) *error = "invalid fmt chunk: " + path;
    return false;
  }

  const size_t bytes_per = bits / 8;
  if (bytes_per == 0) {
    if (error) *error = "invalid bits per sample";
    return false;
  }
  const size_t total = data_len / (bytes_per * channels);
  out->samples.assign(total, 0.0f);
  out->sample_rate = static_cast<int>(sample_rate);

  const float inv_ch = 1.0f / static_cast<float>(channels);
  for (size_t i = 0; i < total; ++i) {
    float acc = 0.0f;
    for (uint16_t c = 0; c < channels; ++c) {
      const uint8_t* s = data_ptr + (i * channels + c) * bytes_per;
      float v = 0.0f;
      if (fmt_tag == kFmtFloat && bits == 32) {
        float fv;
        std::memcpy(&fv, s, 4);
        v = fv;
      } else if (fmt_tag == kFmtFloat && bits == 64) {
        double dv;
        std::memcpy(&dv, s, 8);
        v = static_cast<float>(dv);
      } else if (fmt_tag == kFmtPcm && bits == 16) {
        int16_t iv;
        std::memcpy(&iv, s, 2);
        v = iv / 32768.0f;
      } else if (fmt_tag == kFmtPcm && bits == 8) {
        v = (static_cast<int>(s[0]) - 128) / 128.0f;  // 8-bit is unsigned
      } else if (fmt_tag == kFmtPcm && bits == 24) {
        int32_t iv = static_cast<int32_t>(s[0]) | (static_cast<int32_t>(s[1]) << 8) |
                     (static_cast<int32_t>(s[2]) << 16);
        if (iv & 0x800000) iv |= ~0xFFFFFF;  // sign-extend
        v = iv / 8388608.0f;
      } else if (fmt_tag == kFmtPcm && bits == 32) {
        int32_t iv;
        std::memcpy(&iv, s, 4);
        v = static_cast<float>(iv / 2147483648.0);
      } else {
        if (error) {
          *error = "unsupported format tag " + std::to_string(fmt_tag) + " / " +
                   std::to_string(bits) + " bits";
        }
        return false;
      }
      acc += v;
    }
    out->samples[i] = acc * inv_ch;
  }
  return true;
}

bool write_wav(const std::string& path, const float* samples, size_t count,
               int sample_rate, float normalize_peak, std::string* error) {
  std::ofstream f(path, std::ios::binary);
  if (!f) {
    if (error) *error = "cannot open for write: " + path;
    return false;
  }

  float scale = 1.0f;
  if (normalize_peak > 0.0f && count > 0) {
    float peak = 0.0f;
    for (size_t i = 0; i < count; ++i) peak = std::max(peak, std::fabs(samples[i]));
    if (peak > 0.0f) scale = normalize_peak / peak;
  }

  const uint32_t data_size = static_cast<uint32_t>(count * 2);
  const uint32_t file_size = 36 + data_size;
  const uint32_t byte_rate = static_cast<uint32_t>(sample_rate) * 2;
  const uint16_t fmt_pcm = 1, mono = 1, bits16 = 16, align2 = 2;
  const uint32_t fmt_len = 16;
  const uint32_t sr = static_cast<uint32_t>(sample_rate);

  f.write("RIFF", 4);
  f.write(reinterpret_cast<const char*>(&file_size), 4);
  f.write("WAVE", 4);
  f.write("fmt ", 4);
  f.write(reinterpret_cast<const char*>(&fmt_len), 4);
  f.write(reinterpret_cast<const char*>(&fmt_pcm), 2);
  f.write(reinterpret_cast<const char*>(&mono), 2);
  f.write(reinterpret_cast<const char*>(&sr), 4);
  f.write(reinterpret_cast<const char*>(&byte_rate), 4);
  f.write(reinterpret_cast<const char*>(&align2), 2);
  f.write(reinterpret_cast<const char*>(&bits16), 2);
  f.write("data", 4);
  f.write(reinterpret_cast<const char*>(&data_size), 4);

  std::vector<int16_t> pcm(count);
  for (size_t i = 0; i < count; ++i) {
    float v = samples[i] * scale;
    v = std::min(1.0f, std::max(-1.0f, v));
    pcm[i] = static_cast<int16_t>(v * 32767.0f);
  }
  f.write(reinterpret_cast<const char*>(pcm.data()),
          static_cast<std::streamsize>(pcm.size() * 2));
  return f.good();
}

std::vector<float> resample_linear(const std::vector<float>& audio, int src_sr,
                                   int dst_sr) {
  if (src_sr == dst_sr || audio.empty()) return audio;
  const double ratio = static_cast<double>(dst_sr) / src_sr;
  const size_t out_len = static_cast<size_t>(audio.size() * ratio);
  std::vector<float> out(out_len);
  for (size_t i = 0; i < out_len; ++i) {
    const double pos = i / ratio;
    const size_t i0 = static_cast<size_t>(pos);
    const size_t i1 = std::min(i0 + 1, audio.size() - 1);
    const double frac = pos - static_cast<double>(i0);
    out[i] = static_cast<float>(audio[i0] * (1.0 - frac) + audio[i1] * frac);
  }
  return out;
}

}  // namespace qtts
