#include "bpe.h"

#include <algorithm>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <queue>
#include <sstream>

#include "unicode_tables.h"

namespace qtts {
namespace {

// ---------------------------------------------------------------------------
// UTF-8 helpers
// ---------------------------------------------------------------------------

void utf8_append(uint32_t cp, std::string* out) {
  if (cp < 0x80) {
    out->push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out->push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out->push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out->push_back(static_cast<char>(0xF0 | (cp >> 18)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

// Decode one codepoint at data[i]; advances *len to the byte length (>=1).
// Invalid sequences decode as the single byte value (keeps the scanner total).
uint32_t utf8_decode(const char* data, size_t size, size_t i, size_t* len) {
  const unsigned char c0 = static_cast<unsigned char>(data[i]);
  *len = 1;
  if (c0 < 0x80) return c0;
  int extra = 0;
  uint32_t cp = 0;
  if ((c0 & 0xE0) == 0xC0) {
    extra = 1;
    cp = c0 & 0x1F;
  } else if ((c0 & 0xF0) == 0xE0) {
    extra = 2;
    cp = c0 & 0x0F;
  } else if ((c0 & 0xF8) == 0xF0) {
    extra = 3;
    cp = c0 & 0x07;
  } else {
    return c0;
  }
  if (i + extra >= size) return c0;
  for (int k = 1; k <= extra; ++k) {
    const unsigned char ck = static_cast<unsigned char>(data[i + k]);
    if ((ck & 0xC0) != 0x80) return c0;
    cp = (cp << 6) | (ck & 0x3F);
  }
  *len = static_cast<size_t>(extra) + 1;
  return cp;
}

bool in_ranges(uint32_t cp, const uint32_t ranges[][2], size_t count) {
  size_t lo = 0, hi = count;
  while (lo < hi) {
    const size_t mid = (lo + hi) / 2;
    if (cp < ranges[mid][0]) {
      hi = mid;
    } else if (cp > ranges[mid][1]) {
      lo = mid + 1;
    } else {
      return true;
    }
  }
  return false;
}

bool is_letter(uint32_t cp) {
  return in_ranges(cp, kLetterRanges, kLetterRanges_count);
}
bool is_number(uint32_t cp) {
  return in_ranges(cp, kNumberRanges, kNumberRanges_count);
}
bool is_space(uint32_t cp) {
  return in_ranges(cp, kSpaceRanges, kSpaceRanges_count);
}
bool is_crlf(uint32_t cp) { return cp == '\r' || cp == '\n'; }

// ---------------------------------------------------------------------------
// GPT-2 byte <-> unicode proxy mapping.
//
// Printable bytes map to themselves; the rest map to 256+k in order.  This is
// the standard byte-level BPE alphabet shared by GPT-2/Qwen vocabularies.
// ---------------------------------------------------------------------------

struct ByteProxy {
  std::string proxy[256];              // byte -> proxy char as UTF-8
  std::unordered_map<uint32_t, int> inverse;  // proxy codepoint -> byte

  ByteProxy() {
    std::vector<int> direct;
    for (int b = '!'; b <= '~'; ++b) direct.push_back(b);
    for (int b = 0xA1; b <= 0xAC; ++b) direct.push_back(b);
    for (int b = 0xAE; b <= 0xFF; ++b) direct.push_back(b);
    std::vector<bool> is_direct(256, false);
    for (int b : direct) is_direct[b] = true;
    int next = 0;
    for (int b = 0; b < 256; ++b) {
      uint32_t cp;
      if (is_direct[b]) {
        cp = static_cast<uint32_t>(b);
      } else {
        cp = 256 + next;
        ++next;
      }
      utf8_append(cp, &proxy[b]);
      inverse.emplace(cp, b);
    }
  }
};

const ByteProxy& byte_proxy() {
  static const ByteProxy instance;
  return instance;
}

}  // namespace

// ---------------------------------------------------------------------------
// vocab.json parsing — single-pass scanner for a flat {"token": id} object.
// Handles all JSON string escapes including \uXXXX surrogate pairs (the
// reference parser is BMP-only, tokenizer.cpp:106-285).
// ---------------------------------------------------------------------------

bool QwenBpe::parse_vocab_json(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    error_ = "cannot open vocab file: " + path;
    return false;
  }
  std::stringstream ss;
  ss << f.rdbuf();
  const std::string buf = ss.str();
  const char* p = buf.data();
  const char* end = p + buf.size();

  auto skip_ws = [&]() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) ++p;
  };

  auto parse_string = [&](std::string* out) -> bool {
    if (p >= end || *p != '"') return false;
    ++p;
    out->clear();
    while (p < end && *p != '"') {
      if (*p == '\\') {
        ++p;
        if (p >= end) return false;
        switch (*p) {
          case '"': out->push_back('"'); ++p; break;
          case '\\': out->push_back('\\'); ++p; break;
          case '/': out->push_back('/'); ++p; break;
          case 'b': out->push_back('\b'); ++p; break;
          case 'f': out->push_back('\f'); ++p; break;
          case 'n': out->push_back('\n'); ++p; break;
          case 'r': out->push_back('\r'); ++p; break;
          case 't': out->push_back('\t'); ++p; break;
          case 'u': {
            ++p;
            if (end - p < 4) return false;
            uint32_t cp = 0;
            for (int k = 0; k < 4; ++k) {
              const char c = p[k];
              cp <<= 4;
              if (c >= '0' && c <= '9') cp |= c - '0';
              else if (c >= 'a' && c <= 'f') cp |= c - 'a' + 10;
              else if (c >= 'A' && c <= 'F') cp |= c - 'A' + 10;
              else return false;
            }
            p += 4;
            if (cp >= 0xD800 && cp <= 0xDBFF && end - p >= 6 && p[0] == '\\' &&
                p[1] == 'u') {
              uint32_t lo = 0;
              bool ok = true;
              for (int k = 0; k < 4; ++k) {
                const char c = p[2 + k];
                lo <<= 4;
                if (c >= '0' && c <= '9') lo |= c - '0';
                else if (c >= 'a' && c <= 'f') lo |= c - 'a' + 10;
                else if (c >= 'A' && c <= 'F') lo |= c - 'A' + 10;
                else { ok = false; break; }
              }
              if (ok && lo >= 0xDC00 && lo <= 0xDFFF) {
                cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
                p += 6;
              }
            }
            utf8_append(cp, out);
            break;
          }
          default: return false;
        }
      } else {
        out->push_back(*p);
        ++p;
      }
    }
    if (p >= end) return false;
    ++p;  // closing quote
    return true;
  };

  skip_ws();
  if (p >= end || *p != '{') {
    error_ = "vocab json: expected '{'";
    return false;
  }
  ++p;
  std::string key;
  int32_t max_id = -1;
  std::vector<std::pair<std::string, int32_t>> entries;
  skip_ws();
  if (p < end && *p == '}') {
    ++p;
  } else {
    while (true) {
      skip_ws();
      if (!parse_string(&key)) {
        error_ = "vocab json: bad key string";
        return false;
      }
      skip_ws();
      if (p >= end || *p != ':') {
        error_ = "vocab json: expected ':'";
        return false;
      }
      ++p;
      skip_ws();
      bool neg = false;
      if (p < end && *p == '-') {
        neg = true;
        ++p;
      }
      int64_t v = 0;
      bool any = false;
      while (p < end && *p >= '0' && *p <= '9') {
        v = v * 10 + (*p - '0');
        ++p;
        any = true;
      }
      if (!any) {
        error_ = "vocab json: expected integer id";
        return false;
      }
      const int32_t id = static_cast<int32_t>(neg ? -v : v);
      entries.emplace_back(key, id);
      if (id > max_id) max_id = id;
      skip_ws();
      if (p < end && *p == ',') {
        ++p;
        continue;
      }
      if (p < end && *p == '}') {
        ++p;
        break;
      }
      error_ = "vocab json: expected ',' or '}'";
      return false;
    }
  }

  token_id_.reserve(entries.size() * 2);
  id_token_.assign(static_cast<size_t>(max_id) + 1, std::string());
  for (auto& e : entries) {
    token_id_.emplace(e.first, e.second);
    if (e.second >= 0) id_token_[e.second] = e.first;
  }

  const ByteProxy& bp = byte_proxy();
  for (int b = 0; b < 256; ++b) {
    auto it = token_id_.find(bp.proxy[b]);
    byte_sym_[b] = it == token_id_.end() ? -1 : it->second;
  }
  return true;
}

bool QwenBpe::parse_merges(const std::string& path) {
  std::ifstream f(path);
  if (!f) {
    error_ = "cannot open merges file: " + path;
    return false;
  }
  std::string line;
  int32_t rank = 0;
  merges_.reserve(1 << 18);
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty() || line[0] == '#') continue;
    const size_t sp = line.find(' ');
    if (sp == std::string::npos) continue;
    const std::string left = line.substr(0, sp);
    const std::string right = line.substr(sp + 1);
    auto li = token_id_.find(left);
    auto ri = token_id_.find(right);
    if (li == token_id_.end() || ri == token_id_.end()) {
      ++rank;  // keep rank numbering aligned with file order
      continue;
    }
    auto mi = token_id_.find(left + right);
    const int32_t merged = mi == token_id_.end() ? -1 : mi->second;
    if (merged >= 0) {
      merges_.emplace(pack(li->second, ri->second), MergeInfo{rank, merged});
    }
    ++rank;
  }
  num_merges_ = static_cast<size_t>(rank);
  return true;
}

bool QwenBpe::load(const std::string& vocab_path, const std::string& merges_path,
                   PreTokMode mode) {
  mode_ = mode;
  loaded_ = false;
  if (!parse_vocab_json(vocab_path)) return false;
  if (!merges_path.empty()) {
    if (!parse_merges(merges_path)) return false;
  }
  loaded_ = true;
  return true;
}

// ---------------------------------------------------------------------------
// Pre-tokenization
// ---------------------------------------------------------------------------

namespace {

// Contraction suffix after an apostrophe at data[i] ('s 't 're 've 'm 'll 'd),
// case-insensitive per the Qwen2 (?i:) group.  Returns total length incl. the
// apostrophe, or 0.
size_t match_contraction(const char* data, size_t size, size_t i,
                         bool case_insensitive) {
  if (data[i] != '\'') return 0;
  auto low = [&](size_t k) -> char {
    char c = data[k];
    if (case_insensitive && c >= 'A' && c <= 'Z') c += 32;
    return c;
  };
  if (i + 2 < size) {
    const char a = low(i + 1), b = low(i + 2);
    if ((a == 'r' && b == 'e') || (a == 'v' && b == 'e') ||
        (a == 'l' && b == 'l')) {
      return 3;
    }
  }
  if (i + 1 < size) {
    const char a = low(i + 1);
    if (a == 's' || a == 't' || a == 'm' || a == 'd') return 2;
  }
  return 0;
}

}  // namespace

std::vector<std::pair<size_t, size_t>> QwenBpe::pre_tokenize(
    const std::string& text) const {
  std::vector<std::pair<size_t, size_t>> spans;
  const char* data = text.data();
  const size_t size = text.size();

  if (mode_ == kReferenceAscii) {
    // Byte-level emulation of the reference's simplified std::regex pattern
    // (tokenizer.cpp:366-372), alternation order:
    //   contractions | " ?[A-Za-z]+" | "[0-9]+" | " ?[^\s\w]+" | "\s+"
    // std::sregex_iterator skips bytes where no alternative matches.
    auto is_al = [](unsigned char c) {
      return (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z');
    };
    auto is_dg = [](unsigned char c) { return c >= '0' && c <= '9'; };
    auto is_ws = [](unsigned char c) {
      return c == ' ' || c == '\t' || c == '\n' || c == '\v' || c == '\f' ||
             c == '\r';
    };
    auto is_word = [&](unsigned char c) {
      return is_al(c) || is_dg(c) || c == '_';
    };
    auto is_special = [&](unsigned char c) { return !is_ws(c) && !is_word(c); };

    size_t i = 0;
    while (i < size) {
      const unsigned char c = static_cast<unsigned char>(data[i]);
      size_t n = match_contraction(data, size, i, /*case_insensitive=*/false);
      if (n == 0) {
        if (is_al(c) || (c == ' ' && i + 1 < size &&
                         is_al(static_cast<unsigned char>(data[i + 1])))) {
          size_t j = i + (c == ' ' ? 1 : 0);
          while (j < size && is_al(static_cast<unsigned char>(data[j]))) ++j;
          n = j - i;
        } else if (is_dg(c)) {
          size_t j = i;
          while (j < size && is_dg(static_cast<unsigned char>(data[j]))) ++j;
          n = j - i;
        } else if (is_special(c) ||
                   (c == ' ' && i + 1 < size &&
                    is_special(static_cast<unsigned char>(data[i + 1])))) {
          size_t j = i + (c == ' ' ? 1 : 0);
          while (j < size && is_special(static_cast<unsigned char>(data[j]))) ++j;
          n = j - i;
        } else if (is_ws(c)) {
          size_t j = i;
          while (j < size && is_ws(static_cast<unsigned char>(data[j]))) ++j;
          n = j - i;
        }
      }
      if (n == 0) {
        ++i;  // unmatched byte: dropped, like the regex iterator
      } else {
        spans.emplace_back(i, n);
        i += n;
      }
    }
    return spans;
  }

  // kQwen2: full HF Qwen2 pattern semantics over Unicode codepoints:
  //   (?i:'s|'t|'re|'ve|'m|'ll|'d) | [^\r\n\p{L}\p{N}]?\p{L}+ | \p{N}
  //   | " ?"[^\s\p{L}\p{N}]+[\r\n]* | \s*[\r\n]+ | \s+(?!\S) | \s+
  struct Cp {
    uint32_t cp;
    size_t off;
    size_t len;
  };
  std::vector<Cp> cps;
  cps.reserve(size);
  for (size_t i = 0; i < size;) {
    size_t len;
    const uint32_t cp = utf8_decode(data, size, i, &len);
    cps.push_back({cp, i, len});
    i += len;
  }
  const size_t n = cps.size();

  auto span_from = [&](size_t a, size_t b) {  // codepoint indices [a, b)
    const size_t off = cps[a].off;
    const size_t end = b < n ? cps[b].off : size;
    spans.emplace_back(off, end - off);
  };

  size_t i = 0;
  while (i < n) {
    const uint32_t c = cps[i].cp;

    // 1. contractions (ASCII apostrophe only, matching the HF pattern)
    if (c == '\'' && cps[i].len == 1) {
      const size_t blen =
          match_contraction(data, size, cps[i].off, /*case_insensitive=*/true);
      if (blen > 0) {
        spans.emplace_back(cps[i].off, blen);
        i += blen;  // contraction chars are all 1-byte
        continue;
      }
    }

    // 2. [^\r\n\p{L}\p{N}]?\p{L}+
    if (is_letter(c)) {
      size_t j = i + 1;
      while (j < n && is_letter(cps[j].cp)) ++j;
      span_from(i, j);
      i = j;
      continue;
    }
    if (!is_crlf(c) && !is_number(c) && i + 1 < n && is_letter(cps[i + 1].cp)) {
      size_t j = i + 1;
      while (j < n && is_letter(cps[j].cp)) ++j;
      span_from(i, j);
      i = j;
      continue;
    }

    // 3. \p{N} — a single number codepoint
    if (is_number(c)) {
      span_from(i, i + 1);
      ++i;
      continue;
    }

    // 4. " ?"[^\s\p{L}\p{N}]+[\r\n]*
    auto is_punct = [&](uint32_t cp) {
      return !is_space(cp) && !is_letter(cp) && !is_number(cp);
    };
    {
      size_t start = i;
      size_t j = i;
      if (c == ' ' && i + 1 < n && is_punct(cps[i + 1].cp)) j = i + 1;
      if (is_punct(cps[j].cp)) {
        size_t k = j;
        while (k < n && is_punct(cps[k].cp)) ++k;
        while (k < n && is_crlf(cps[k].cp)) ++k;
        span_from(start, k);
        i = k;
        continue;
      }
    }

    // 5/6/7. whitespace runs
    if (is_space(c)) {
      size_t j = i;
      while (j < n && is_space(cps[j].cp)) ++j;
      // 5. \s*[\r\n]+ — backtracking picks the LAST \r\n in the run
      size_t last_crlf = n;  // sentinel
      for (size_t k = j; k > i;) {
        --k;
        if (is_crlf(cps[k].cp)) {
          last_crlf = k;
          break;
        }
      }
      if (last_crlf != n) {
        span_from(i, last_crlf + 1);
        i = last_crlf + 1;
        continue;
      }
      // 6. \s+(?!\S): all but the final space when a non-space follows
      if (j < n && j - i > 1) {
        span_from(i, j - 1);
        i = j - 1;
        continue;
      }
      if (j == n) {
        span_from(i, j);
        i = j;
        continue;
      }
      // 7. \s+ (single space before a non-space)
      span_from(i, j);
      i = j;
      continue;
    }

    ++i;  // unreachable in practice (class 4 covers everything non-space)
  }
  return spans;
}

// ---------------------------------------------------------------------------
// BPE merge loop: linked list + min-heap over candidate pairs.
// ---------------------------------------------------------------------------

void QwenBpe::bpe_chunk(const char* data, size_t len,
                        std::vector<int32_t>* out) const {
  if (len == 0) return;

  struct Node {
    int32_t sym;   // current vocab id at this slot (-1 = dead)
    int32_t prev;
    int32_t next;
  };
  // Initial symbols: one per byte via the proxy alphabet.
  std::vector<Node> nodes(len);
  std::vector<bool> raw_byte(len, false);  // proxy char absent from vocab
  for (size_t i = 0; i < len; ++i) {
    const unsigned char b = static_cast<unsigned char>(data[i]);
    int32_t sym = byte_sym_[b];
    if (sym < 0) {
      // OOV byte: reference emits the raw byte value as the id
      // (tokenizer.cpp:472-480); mark so no merge ever touches it.
      sym = static_cast<int32_t>(b);
      raw_byte[i] = true;
    }
    nodes[i] = {sym, static_cast<int32_t>(i) - 1,
                i + 1 < len ? static_cast<int32_t>(i) + 1 : -1};
  }

  struct Cand {
    int32_t rank;
    int32_t pos;
    int32_t left_sym, right_sym;  // validity snapshot
    bool operator>(const Cand& o) const {
      return rank != o.rank ? rank > o.rank : pos > o.pos;
    }
  };
  std::priority_queue<Cand, std::vector<Cand>, std::greater<Cand>> heap;

  auto push_pair = [&](int32_t i) {
    if (i < 0) return;
    const int32_t j = nodes[i].next;
    if (j < 0) return;
    if (raw_byte[i] || raw_byte[j]) return;
    auto it = merges_.find(pack(nodes[i].sym, nodes[j].sym));
    if (it == merges_.end()) return;
    heap.push({it->second.rank, i, nodes[i].sym, nodes[j].sym});
  };

  for (size_t i = 0; i + 1 < len; ++i) push_pair(static_cast<int32_t>(i));

  while (!heap.empty()) {
    const Cand c = heap.top();
    heap.pop();
    const int32_t i = c.pos;
    if (nodes[i].sym != c.left_sym) continue;  // stale
    const int32_t j = nodes[i].next;
    if (j < 0 || nodes[j].sym != c.right_sym) continue;
    auto it = merges_.find(pack(nodes[i].sym, nodes[j].sym));
    if (it == merges_.end()) continue;

    nodes[i].sym = it->second.merged_id;
    nodes[i].next = nodes[j].next;
    if (nodes[j].next >= 0) nodes[nodes[j].next].prev = i;
    nodes[j].sym = -1;

    push_pair(nodes[i].prev);
    push_pair(i);
  }

  for (int32_t i = 0; i >= 0; i = nodes[i].next) {
    out->push_back(nodes[i].sym);
  }
}

std::vector<int32_t> QwenBpe::encode(const std::string& text) const {
  std::vector<int32_t> out;
  if (text.empty()) return out;
  if (!loaded_) {
    for (unsigned char c : text) out.push_back(c);  // degraded byte mode
    return out;
  }
  const auto spans = pre_tokenize(text);
  out.reserve(text.size() / 3 + 4);
  for (const auto& s : spans) {
    bpe_chunk(text.data() + s.first, s.second, &out);
  }
  return out;
}

std::string QwenBpe::decode(const std::vector<int32_t>& ids) const {
  std::string bytes;
  const ByteProxy& bp = byte_proxy();
  for (int32_t id : ids) {
    if (id < 0 || static_cast<size_t>(id) >= id_token_.size()) continue;
    const std::string& tok = id_token_[id];
    for (size_t i = 0; i < tok.size();) {
      size_t len;
      const uint32_t cp = utf8_decode(tok.data(), tok.size(), i, &len);
      auto it = bp.inverse.find(cp);
      if (it != bp.inverse.end()) {
        bytes.push_back(static_cast<char>(it->second));
      }
      i += len;
    }
  }
  return bytes;
}

std::string QwenBpe::token_to_string(int32_t id) const {
  if (id < 0 || static_cast<size_t>(id) >= id_token_.size()) return "";
  return id_token_[id];
}

int32_t QwenBpe::string_to_token(const std::string& token) const {
  auto it = token_id_.find(token);
  return it == token_id_.end() ? -1 : it->second;
}

}  // namespace qtts
