// Native data-loader core for lctvqa.
//
// Three hot-path primitives behind a C ABI (loaded via ctypes):
//   - lct_tokenize:      the (\W+)-split tokenizer (lctvqa/text.py) in C++
//   - lct_sample_answers: per-item uniform choice among valid answers +
//                         -1-padded multi-choice packing
//   - lct_gather_rows:   batched row gather for uint8 image arrays
//
// Build: python -m lctvqa.native.build  (g++ -O3 -shared -fPIC)

#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// Tokenize `s` (utf-8, ASCII-word semantics matching Python's re \W on
// str.lower(): [a-zA-Z0-9_] are word chars). Writes '\n'-joined tokens
// into `out` (cap bytes incl. NUL). Returns token count, or -1 on
// overflow. Mirrors: split on (\W+) keeping separators, strip, drop
// empties, lowercase first.
int lct_tokenize(const char* s, char* out, int cap) {
    std::string cur;
    std::string result;
    int count = 0;
    bool cur_is_word = false;
    bool have_cur = false;

    auto flush = [&]() -> bool {
        if (!have_cur) return true;
        // strip whitespace
        size_t b = cur.find_first_not_of(" \t\r\n\f\v");
        if (b == std::string::npos) { cur.clear(); have_cur = false;
                                      return true; }
        size_t e = cur.find_last_not_of(" \t\r\n\f\v");
        std::string tok = cur.substr(b, e - b + 1);
        if (!result.empty()) result += '\n';
        result += tok;
        ++count;
        cur.clear();
        have_cur = false;
        return true;
    };

    for (const char* p = s; *p; ++p) {
        unsigned char c = static_cast<unsigned char>(*p);
        char lc = static_cast<char>(std::tolower(c));
        // Python \w for ASCII: alnum or underscore. Non-ASCII bytes are
        // treated as word chars (Python's str \w matches unicode letters;
        // utf-8 continuation bytes stay inside their token).
        bool is_word = (std::isalnum(c) != 0) || c == '_' || c >= 0x80;
        if (!have_cur || is_word != cur_is_word) {
            if (!flush()) return -1;
            cur_is_word = is_word;
            have_cur = true;
        }
        cur += lc;
    }
    if (!flush()) return -1;
    if (static_cast<int>(result.size()) + 1 > cap) return -1;
    std::memcpy(out, result.c_str(), result.size() + 1);
    return count;
}

// splitmix64: deterministic, seedable, portable.
static inline uint64_t splitmix64(uint64_t* state) {
    uint64_t z = (*state += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
}

// enc_ans: uint8 [b, a] count vector per item. For each item draw one
// valid (count>0) answer uniformly; label = unk_idx when none. mc gets
// the first max_num_ans valid indices, -1 padded.
void lct_sample_answers(const uint8_t* enc_ans, int b, int a, int unk_idx,
                        uint64_t seed, int32_t* labels, int32_t* mc,
                        int max_num_ans) {
    uint64_t st = seed ^ 0xA0761D6478BD642Full;
    for (int i = 0; i < b; ++i) {
        const uint8_t* row = enc_ans + static_cast<int64_t>(i) * a;
        int n_valid = 0;
        for (int j = 0; j < a; ++j) {
            if (row[j] > 0) {
                if (n_valid < max_num_ans) mc[i * max_num_ans + n_valid] = j;
                ++n_valid;
            }
        }
        for (int j = n_valid < max_num_ans ? n_valid : max_num_ans;
             j < max_num_ans; ++j)
            mc[i * max_num_ans + j] = -1;
        if (n_valid == 0) {
            labels[i] = unk_idx;
            continue;
        }
        uint64_t r = splitmix64(&st);
        int pick = static_cast<int>(r % static_cast<uint64_t>(n_valid));
        // find the pick-th valid column
        int seen = 0;
        int lab = unk_idx;
        for (int j = 0; j < a; ++j) {
            if (row[j] > 0 && seen++ == pick) { lab = j; break; }
        }
        labels[i] = lab;
    }
}

// dst[i] = src[rows[i]] ; item_bytes bytes per row. The copy is pure
// memory bandwidth, so it parallelizes linearly until DRAM saturates;
// num_threads maps the reference's DataLoader `num_workers` knob
// (basic_vqa/config.py:32) onto this gather.
void lct_gather_rows(const uint8_t* src, const int32_t* rows, int b,
                     long long item_bytes, uint8_t* dst, int num_threads) {
    auto copy_range = [=](int lo, int hi) {
        for (int i = lo; i < hi; ++i) {
            std::memcpy(dst + static_cast<int64_t>(i) * item_bytes,
                        src + static_cast<int64_t>(rows[i]) * item_bytes,
                        static_cast<size_t>(item_bytes));
        }
    };
    // thread spawn (~10us each) only pays off on big copies
    const long long total = static_cast<long long>(b) * item_bytes;
    if (num_threads <= 1 || b < 2 || total < (1 << 20)) {
        copy_range(0, b);
        return;
    }
    int t = num_threads < b ? num_threads : b;
    std::vector<std::thread> threads;
    threads.reserve(t);
    int per = (b + t - 1) / t;
    for (int k = 0; k < t; ++k) {
        int lo = k * per;
        int hi = lo + per < b ? lo + per : b;
        if (lo >= hi) break;
        threads.emplace_back(copy_range, lo, hi);
    }
    for (auto& th : threads) th.join();
}

}  // extern "C"
