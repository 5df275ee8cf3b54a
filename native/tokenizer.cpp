// CLIP byte-level BPE merge loop in C++.
//
// The Python tokenizer (data/tokenizer.py) does the regex word split and
// byte-to-unicode mapping; the per-word BPE merge loop — the O(n^2)
// inner kernel — runs here. Exposed via ctypes; the Python fallback
// implements identical semantics (ties broken by merge rank, lowest
// first, matching openai/CLIP).
//
// Build: make -C native   (part of libvst_preprocess.so's Makefile via
// a second target) -> native/build/libvst_tokenizer.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
    std::unordered_map<std::string, int> vocab;
    std::unordered_map<std::string, int> ranks;  // "a b" -> rank
};

// split a UTF-8 string into code points
std::vector<std::string> utf8_split(const std::string& s) {
    std::vector<std::string> out;
    size_t i = 0;
    while (i < s.size()) {
        size_t len = 1;
        unsigned char c = s[i];
        if ((c & 0x80) == 0) len = 1;
        else if ((c & 0xE0) == 0xC0) len = 2;
        else if ((c & 0xF0) == 0xE0) len = 3;
        else if ((c & 0xF8) == 0xF0) len = 4;
        out.push_back(s.substr(i, len));
        i += len;
    }
    return out;
}

}  // namespace

extern "C" {

void* tok_create(const char* vocab_blob, const char* merges_blob) {
    auto* t = new Tokenizer();
    // vocab: lines of "token\tid"
    {
        const char* p = vocab_blob;
        while (*p) {
            const char* tab = strchr(p, '\t');
            if (!tab) break;
            const char* nl = strchr(tab, '\n');
            if (!nl) nl = tab + strlen(tab);
            std::string token(p, tab - p);
            int id = atoi(std::string(tab + 1, nl - tab - 1).c_str());
            t->vocab.emplace(std::move(token), id);
            if (!*nl) break;
            p = nl + 1;
        }
    }
    // merges: lines of "a b", rank = line index
    {
        const char* p = merges_blob;
        int rank = 0;
        while (*p) {
            const char* nl = strchr(p, '\n');
            if (!nl) nl = p + strlen(p);
            std::string line(p, nl - p);
            if (!line.empty())
                t->ranks.emplace(std::move(line), rank++);
            if (!*nl) break;
            p = nl + 1;
        }
    }
    return t;
}

void tok_destroy(void* handle) {
    delete static_cast<Tokenizer*>(handle);
}

// BPE-encode one byte-encoded word (unicode symbols, WITHOUT the </w>
// suffix — it is appended here, CLIP-style). Writes ids; returns count,
// or -1 if a symbol is missing from the vocab.
int tok_bpe(void* handle, const char* word_utf8, int* out_ids,
            int max_out) {
    auto* t = static_cast<Tokenizer*>(handle);
    std::string w(word_utf8);
    if (w.empty()) return 0;
    std::vector<std::string> parts = utf8_split(w);
    parts.back() += "</w>";

    while (parts.size() > 1) {
        int best_rank = INT32_MAX;
        size_t best_i = 0;
        for (size_t i = 0; i + 1 < parts.size(); ++i) {
            auto it = t->ranks.find(parts[i] + " " + parts[i + 1]);
            if (it != t->ranks.end() && it->second < best_rank) {
                best_rank = it->second;
                best_i = i;
            }
        }
        if (best_rank == INT32_MAX) break;
        // merge ALL (non-overlapping, left-to-right) occurrences of the
        // best pair — matching the reference BPE's word.index scan
        const std::string a = parts[best_i];
        const std::string b = parts[best_i + 1];
        std::vector<std::string> merged;
        merged.reserve(parts.size());
        for (size_t i = 0; i < parts.size();) {
            if (i + 1 < parts.size() && parts[i] == a && parts[i + 1] == b) {
                merged.push_back(a + b);
                i += 2;
            } else {
                merged.push_back(parts[i]);
                i += 1;
            }
        }
        parts.swap(merged);
    }

    int n = 0;
    for (const auto& p : parts) {
        if (n >= max_out) return n;
        auto it = t->vocab.find(p);
        if (it == t->vocab.end()) return -1;
        out_ids[n++] = it->second;
    }
    return n;
}

}  // extern "C"
