// vzt_tokenizer.cpp — native sentencepiece-style BPE tokenizer (encode +
// decode) for the serving path.
//
// The reference tokenizes through HF transformers (Python) everywhere
// (`vis_zephyr/model/mm_utils.py:tokenizer_image_token`). This native
// implementation covers the LLaMA/Mistral tokenizer family the Zephyr-7B-β
// checkpoint uses: BPE over Metaspace-normalized text (spaces → ▁ with a
// dummy prefix) with byte fallback. It loads a compact binary exported from
// tokenizer.json by `vis_zephyr_tpu/data/tokenizer_native.py` and exposes a
// C ABI consumed via ctypes (GIL released during encode, so serving threads
// tokenize in parallel).
//
// Encode is the classic O(n log n) agenda BPE: a doubly linked symbol list
// plus a rank-ordered heap of candidate merges, with lazy invalidation.
//
// Build: g++ -O3 -fPIC -shared -std=c++17 -o libvzt_tokenizer.so vzt_tokenizer.cpp

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct MergeInfo {
  uint32_t rank;
  int32_t merged_id;
};

struct Tokenizer {
  std::vector<std::string> vocab;
  std::unordered_map<std::string, int32_t> token_to_id;
  std::unordered_map<uint64_t, MergeInfo> merges;  // (left<<32)|right
  int32_t unk_id = 0;
  int32_t bos_id = 1;
  int32_t eos_id = 2;
  bool byte_fallback = false;
  bool dummy_prefix = true;
  int32_t byte_ids[256];  // id of "<0xXX>" or -1
};

uint64_t pair_key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

bool read_u32(const uint8_t*& p, const uint8_t* end, uint32_t* out) {
  if (end - p < 4) return false;
  std::memcpy(out, p, 4);
  p += 4;
  return true;
}

Tokenizer* load_from_buffer(const uint8_t* buf, size_t len) {
  const uint8_t* p = buf;
  const uint8_t* end = buf + len;
  uint32_t magic, version, flags, vocab_size, n_merges;
  uint32_t unk, bos, eos;
  if (!read_u32(p, end, &magic) || magic != 0x565A544Bu) return nullptr;
  if (!read_u32(p, end, &version) || version != 1) return nullptr;
  if (!read_u32(p, end, &flags)) return nullptr;
  if (!read_u32(p, end, &vocab_size) || !read_u32(p, end, &n_merges))
    return nullptr;
  if (!read_u32(p, end, &unk) || !read_u32(p, end, &bos) ||
      !read_u32(p, end, &eos))
    return nullptr;

  auto* tok = new Tokenizer();
  tok->byte_fallback = flags & 1u;
  tok->dummy_prefix = flags & 2u;
  tok->unk_id = static_cast<int32_t>(unk);
  tok->bos_id = static_cast<int32_t>(bos);
  tok->eos_id = static_cast<int32_t>(eos);
  tok->vocab.reserve(vocab_size);
  for (uint32_t i = 0; i < vocab_size; ++i) {
    uint32_t n;
    if (!read_u32(p, end, &n) || static_cast<size_t>(end - p) < n) {
      delete tok;
      return nullptr;
    }
    tok->vocab.emplace_back(reinterpret_cast<const char*>(p), n);
    p += n;
    tok->token_to_id.emplace(tok->vocab.back(), static_cast<int32_t>(i));
  }
  for (uint32_t r = 0; r < n_merges; ++r) {
    uint32_t a, b, m;
    if (!read_u32(p, end, &a) || !read_u32(p, end, &b) || !read_u32(p, end, &m)) {
      delete tok;
      return nullptr;
    }
    tok->merges.emplace(pair_key(a, b), MergeInfo{r, static_cast<int32_t>(m)});
  }
  for (int i = 0; i < 256; ++i) {
    char name[8];
    std::snprintf(name, sizeof(name), "<0x%02X>", i);
    auto it = tok->token_to_id.find(name);
    tok->byte_ids[i] = it == tok->token_to_id.end() ? -1 : it->second;
  }
  return tok;
}

// One symbol in the BPE working list.
struct Symbol {
  int32_t id;
  int32_t prev, next;
  uint32_t version;  // bumped on merge → stale heap entries skipped
  bool alive;
};

struct Candidate {
  uint32_t rank;
  int32_t left_pos;
  uint32_t left_version, right_version;
};
struct CandidateOrder {
  bool operator()(const Candidate& a, const Candidate& b) const {
    if (a.rank != b.rank) return a.rank > b.rank;
    return a.left_pos > b.left_pos;  // ties: leftmost first (HF order)
  }
};

size_t utf8_len(uint8_t c) {
  if (c < 0x80) return 1;
  if ((c >> 5) == 0x6) return 2;
  if ((c >> 4) == 0xE) return 3;
  if ((c >> 3) == 0x1E) return 4;
  return 1;  // invalid byte: treat as single
}

int encode_impl(const Tokenizer* tok, const char* text, size_t text_len,
                int32_t* out, int max_out) {
  // Metaspace normalization: " " → "▁" (U+2581), optional dummy prefix.
  static const char kMeta[] = "\xe2\x96\x81";
  if (text_len == 0) return 0;  // HF normalizers leave empty input empty
  std::string s;
  s.reserve(text_len + 4);
  if (tok->dummy_prefix) s += kMeta;
  for (size_t i = 0; i < text_len; ++i) {
    if (text[i] == ' ')
      s += kMeta;
    else
      s += text[i];
  }

  // Initial symbols: one per UTF-8 codepoint, with byte fallback.
  std::vector<Symbol> syms;
  std::vector<std::string> pieces;  // piece string per symbol (for rebuilds)
  syms.reserve(s.size());
  for (size_t i = 0; i < s.size();) {
    size_t n = utf8_len(static_cast<uint8_t>(s[i]));
    if (i + n > s.size()) n = 1;
    std::string piece = s.substr(i, n);
    auto it = tok->token_to_id.find(piece);
    if (it != tok->token_to_id.end()) {
      syms.push_back({it->second, 0, 0, 0, true});
      pieces.push_back(std::move(piece));
    } else if (tok->byte_fallback) {
      for (size_t k = 0; k < n; ++k) {
        uint8_t b = static_cast<uint8_t>(piece[k]);
        int32_t id = tok->byte_ids[b];
        syms.push_back({id >= 0 ? id : tok->unk_id, 0, 0, 0, true});
        pieces.push_back(std::string(1, piece[k]));
      }
    } else {
      syms.push_back({tok->unk_id, 0, 0, 0, true});
      pieces.push_back(std::move(piece));
    }
    i += n;
  }
  const int n = static_cast<int>(syms.size());
  for (int i = 0; i < n; ++i) {
    syms[i].prev = i - 1;
    syms[i].next = i + 1 < n ? i + 1 : -1;
  }

  std::priority_queue<Candidate, std::vector<Candidate>, CandidateOrder> heap;
  auto push_pair = [&](int left) {
    if (left < 0) return;
    int right = syms[left].next;
    if (right < 0) return;
    auto it = tok->merges.find(pair_key(syms[left].id, syms[right].id));
    if (it == tok->merges.end()) return;
    heap.push({it->second.rank, left, syms[left].version, syms[right].version});
  };
  for (int i = 0; i + 1 < n; ++i) push_pair(i);

  while (!heap.empty()) {
    Candidate c = heap.top();
    heap.pop();
    int left = c.left_pos;
    if (!syms[left].alive || syms[left].version != c.left_version) continue;
    int right = syms[left].next;
    if (right < 0 || syms[right].version != c.right_version) continue;
    auto it = tok->merges.find(pair_key(syms[left].id, syms[right].id));
    if (it == tok->merges.end() || it->second.rank != c.rank) continue;

    syms[left].id = it->second.merged_id;
    syms[left].version++;
    syms[right].alive = false;
    syms[left].next = syms[right].next;
    if (syms[right].next >= 0) syms[syms[right].next].prev = left;
    push_pair(syms[left].prev);
    push_pair(left);
  }

  int count = 0;
  bool overflow = false;
  for (int i = 0; i >= 0 && i < n; i = syms[i].next) {
    if (!syms[i].alive) continue;
    if (count < max_out) {
      out[count] = syms[i].id;
    } else {
      overflow = true;  // keep counting (unwritten) so |count| is the TRUE
    }                   // total the retry must allocate, not just max_out
    count++;
  }
  return overflow ? -count : count;
}

int decode_impl(const Tokenizer* tok, const int32_t* ids, int n_ids,
                char* out, int max_out) {
  static const char kMeta[] = "\xe2\x96\x81";
  std::string result;
  for (int i = 0; i < n_ids; ++i) {
    int32_t id = ids[i];
    if (id < 0 || static_cast<size_t>(id) >= tok->vocab.size()) continue;
    const std::string& piece = tok->vocab[id];
    // Byte tokens "<0xXX>" → raw byte.
    if (piece.size() == 6 && piece[0] == '<' && piece[1] == '0' &&
        piece[2] == 'x' && piece[5] == '>') {
      int hi = std::isdigit(piece[3]) ? piece[3] - '0' : (piece[3] & 0xDF) - 'A' + 10;
      int lo = std::isdigit(piece[4]) ? piece[4] - '0' : (piece[4] & 0xDF) - 'A' + 10;
      result += static_cast<char>((hi << 4) | lo);
      continue;
    }
    // "▁" → space.
    size_t pos = 0;
    while (pos < piece.size()) {
      if (piece.compare(pos, 3, kMeta) == 0) {
        result += ' ';
        pos += 3;
      } else {
        result += piece[pos++];
      }
    }
  }
  // sentencepiece drops the dummy-prefix leading space.
  size_t start = (!result.empty() && result[0] == ' ') ? 1 : 0;
  int len = static_cast<int>(result.size() - start);
  if (len > max_out) return -len;
  std::memcpy(out, result.data() + start, len);
  return len;
}

}  // namespace

extern "C" {

void* vzt_tok_load(const uint8_t* buf, long len) {
  return load_from_buffer(buf, static_cast<size_t>(len));
}

void vzt_tok_free(void* handle) { delete static_cast<Tokenizer*>(handle); }

int vzt_tok_vocab_size(const void* handle) {
  return static_cast<int>(static_cast<const Tokenizer*>(handle)->vocab.size());
}

// Returns token count; negative value = required capacity when out is small.
int vzt_tok_encode(const void* handle, const char* text, long text_len,
                   int32_t* out, int max_out) {
  return encode_impl(static_cast<const Tokenizer*>(handle), text,
                     static_cast<size_t>(text_len), out, max_out);
}

// Returns byte count written; negative = required capacity.
int vzt_tok_decode(const void* handle, const int32_t* ids, int n_ids,
                   char* out, int max_out) {
  return decode_impl(static_cast<const Tokenizer*>(handle), ids, n_ids, out,
                     max_out);
}

}  // extern "C"
