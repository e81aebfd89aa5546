// C ABI for the Python ctypes binding (leaxer_qwen3_tts_tpu/frontend/native.py).
//
// Conventions: functions returning int use 0 = success, negative = failure.
// Variable-length outputs follow the two-call pattern (query size, then fill),
// or accept a caller-provided capacity and return the required count.
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "bpe.h"
#include "wav_io.h"

namespace {
thread_local std::string g_last_error;
}

extern "C" {

const char* qtts_last_error() { return g_last_error.c_str(); }

// ---------------------------------------------------------------------------
// Tokenizer
// ---------------------------------------------------------------------------

void* qtts_tok_create(const char* vocab_path, const char* merges_path, int mode) {
  auto* tok = new qtts::QwenBpe();
  if (!tok->load(vocab_path ? vocab_path : "",
                 merges_path ? merges_path : "",
                 mode == 1 ? qtts::QwenBpe::kReferenceAscii
                           : qtts::QwenBpe::kQwen2)) {
    g_last_error = tok->error();
    delete tok;
    return nullptr;
  }
  return tok;
}

void qtts_tok_destroy(void* handle) {
  delete static_cast<qtts::QwenBpe*>(handle);
}

// Encodes text; writes up to capacity ids into out.  Returns the TOTAL number
// of ids produced (call again with a larger buffer if > capacity), or -1.
int64_t qtts_tok_encode(void* handle, const char* text, int64_t text_len,
                        int32_t* out, int64_t capacity) {
  if (handle == nullptr || text == nullptr) return -1;
  auto* tok = static_cast<qtts::QwenBpe*>(handle);
  const std::vector<int32_t> ids =
      tok->encode(std::string(text, static_cast<size_t>(text_len)));
  const int64_t n = static_cast<int64_t>(ids.size());
  if (out != nullptr && capacity > 0) {
    std::memcpy(out, ids.data(),
                static_cast<size_t>(std::min(n, capacity)) * sizeof(int32_t));
  }
  return n;
}

// Decodes ids to UTF-8 bytes; same two-call pattern.  Returns byte count.
int64_t qtts_tok_decode(void* handle, const int32_t* ids, int64_t n_ids,
                        char* out, int64_t capacity) {
  if (handle == nullptr || ids == nullptr) return -1;
  auto* tok = static_cast<qtts::QwenBpe*>(handle);
  const std::string text =
      tok->decode(std::vector<int32_t>(ids, ids + n_ids));
  const int64_t n = static_cast<int64_t>(text.size());
  if (out != nullptr && capacity > 0) {
    std::memcpy(out, text.data(),
                static_cast<size_t>(std::min(n, capacity)));
  }
  return n;
}

int64_t qtts_tok_token_to_string(void* handle, int32_t id, char* out,
                                 int64_t capacity) {
  if (handle == nullptr) return -1;
  auto* tok = static_cast<qtts::QwenBpe*>(handle);
  const std::string s = tok->token_to_string(id);
  const int64_t n = static_cast<int64_t>(s.size());
  if (out != nullptr && capacity > 0) {
    std::memcpy(out, s.data(), static_cast<size_t>(std::min(n, capacity)));
  }
  return n;
}

int32_t qtts_tok_string_to_token(void* handle, const char* token) {
  if (handle == nullptr || token == nullptr) return -1;
  return static_cast<qtts::QwenBpe*>(handle)->string_to_token(token);
}

int64_t qtts_tok_vocab_size(void* handle) {
  if (handle == nullptr) return -1;
  return static_cast<int64_t>(static_cast<qtts::QwenBpe*>(handle)->vocab_size());
}

int64_t qtts_tok_merges_size(void* handle) {
  if (handle == nullptr) return -1;
  return static_cast<int64_t>(static_cast<qtts::QwenBpe*>(handle)->merges_size());
}

// ---------------------------------------------------------------------------
// WAV I/O
// ---------------------------------------------------------------------------

// Reads a WAV to mono float32.  Returns total sample count (call again with a
// larger buffer if > capacity) or -1; *sample_rate always set on success.
int64_t qtts_wav_read(const char* path, float* out, int64_t capacity,
                      int32_t* sample_rate) {
  qtts::WavData wav;
  std::string err;
  if (!qtts::read_wav(path, &wav, &err)) {
    g_last_error = err;
    return -1;
  }
  if (sample_rate != nullptr) *sample_rate = wav.sample_rate;
  const int64_t n = static_cast<int64_t>(wav.samples.size());
  if (out != nullptr && capacity > 0) {
    std::memcpy(out, wav.samples.data(),
                static_cast<size_t>(std::min(n, capacity)) * sizeof(float));
  }
  return n;
}

int32_t qtts_wav_write(const char* path, const float* samples, int64_t count,
                       int32_t sample_rate, float normalize_peak) {
  std::string err;
  if (!qtts::write_wav(path, samples, static_cast<size_t>(count), sample_rate,
                       normalize_peak, &err)) {
    g_last_error = err;
    return -1;
  }
  return 0;
}

// Linear resample; returns output length (<= capacity fills the buffer).
int64_t qtts_resample(const float* audio, int64_t count, int32_t src_sr,
                      int32_t dst_sr, float* out, int64_t capacity) {
  const std::vector<float> in(audio, audio + count);
  const std::vector<float> res = qtts::resample_linear(in, src_sr, dst_sr);
  const int64_t n = static_cast<int64_t>(res.size());
  if (out != nullptr && capacity > 0) {
    std::memcpy(out, res.data(),
                static_cast<size_t>(std::min(n, capacity)) * sizeof(float));
  }
  return n;
}

}  // extern "C"
