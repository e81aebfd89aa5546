// Self-test binary for the native frontend, intended to run under
// ASan/UBSan in CI (make test-native).  Exit code = number of failures.
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <string>
#include <vector>

#include "src/bpe.h"
#include "src/wav_io.h"

static int failures = 0;

#define CHECK(cond, msg)                                        \
  do {                                                          \
    if (!(cond)) {                                              \
      std::fprintf(stderr, "FAIL: %s (%s:%d)\n", msg, __FILE__, \
                   __LINE__);                                   \
      ++failures;                                               \
    }                                                           \
  } while (0)

static std::string write_temp(const std::string& name, const std::string& body) {
  std::string path = std::string("/tmp/qtts_native_test_") + name;
  std::ofstream f(path, std::ios::binary);
  f << body;
  return path;
}

static void test_bpe() {
  // GPT-2 proxy alphabet: printable ASCII maps to itself, space -> \u0120 (G
  // with breve in the proxy plane).  Build a tiny vocab + merges.
  std::string vocab = "{";
  for (int c = '!'; c <= '~'; ++c) {
    char buf[64];
    if (c == '"' || c == '\\') {
      std::snprintf(buf, sizeof buf, "\"\\%c\": %d, ", c, c);
    } else {
      std::snprintf(buf, sizeof buf, "\"%c\": %d, ", c, c);
    }
    vocab += buf;
  }
  vocab += "\"\\u0120\": 300, \"he\": 301, \"ll\": 302, \"hell\": 303, "
           "\"hello\": 304, \"\\u0120hello\": 305, \"\\ud83d\\ude00\": 306}";
  const std::string vocab_path = write_temp("vocab.json", vocab);
  const std::string merges_path = write_temp(
      "merges.txt", "#version: 0.2\nh e\nl l\nhe ll\nhell o\n\u0120 hello\n");

  qtts::QwenBpe tok;
  CHECK(tok.load(vocab_path, merges_path, qtts::QwenBpe::kQwen2), "bpe load");
  CHECK(tok.vocab_size() > 256 / 3, "vocab size");

  auto ids = tok.encode("hello hello");
  CHECK(ids.size() == 2 && ids[0] == 304 && ids[1] == 305, "merge chain");
  CHECK(tok.decode(ids) == "hello hello", "decode roundtrip");
  CHECK(tok.string_to_token("hello") == 304, "string_to_token");
  CHECK(tok.token_to_string(304) == "hello", "token_to_string");
  CHECK(tok.string_to_token("\xF0\x9F\x98\x80") == 306, "surrogate-pair key");
  CHECK(tok.encode("").empty(), "empty input");
  // byte-level UTF-8 input must not crash / read OOB
  auto cjk = tok.encode("\xE4\xBD\xA0\xE5\xA5\xBD");
  CHECK(!cjk.empty(), "cjk bytes tokenize");
  // truncated multi-byte sequence
  auto trunc = tok.encode(std::string("\xE4\xBD", 2));
  CHECK(trunc.size() >= 1, "truncated utf8 survives");
}

static void test_wav() {
  std::vector<float> audio(2400);
  for (size_t i = 0; i < audio.size(); ++i) {
    audio[i] = 0.5f * std::sin(2.0f * 3.14159265f * 440.0f * i / 24000.0f);
  }
  const std::string path = "/tmp/qtts_native_test.wav";
  std::string err;
  CHECK(qtts::write_wav(path, audio.data(), audio.size(), 24000, 0.0f, &err),
        "write_wav");
  qtts::WavData back;
  CHECK(qtts::read_wav(path, &back, &err), "read_wav");
  CHECK(back.sample_rate == 24000, "sample rate");
  CHECK(back.samples.size() == audio.size(), "sample count");
  float max_err = 0.0f;
  for (size_t i = 0; i < audio.size(); ++i) {
    max_err = std::max(max_err, std::fabs(back.samples[i] - audio[i]));
  }
  CHECK(max_err < 2.0f / 32768.0f, "16-bit quantization bound");

  auto up = qtts::resample_linear(audio, 24000, 48000);
  CHECK(up.size() == audio.size() * 2, "resample length");

  qtts::WavData bad;
  CHECK(!qtts::read_wav("/tmp/definitely_missing.wav", &bad, &err),
        "missing file fails");
  const std::string garbage = write_temp("garbage.wav", "not a wav at all!!");
  CHECK(!qtts::read_wav(garbage, &bad, &err), "garbage file fails");
}

int main() {
  test_bpe();
  test_wav();
  if (failures == 0) {
    std::printf("native self-test: all checks passed\n");
  }
  return failures;
}
