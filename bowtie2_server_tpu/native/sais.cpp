// SA-IS suffix array construction (the native-core counterpart of the
// reference's blockwise Kärkkäinen sort / libsais backend, ref:
// blockwise_sa.h:255, third_party/libsais). Standard induced-sorting
// algorithm (Nong, Zhang & Chan 2009), written for int32 positions —
// handles genomes up to 2^31 bp; the .bt2l-scale 64-bit variant is a
// planned extension.
//
// Exposed C ABI:
//   int bt2tpu_sais(const uint8_t* text, int32_t n, int32_t* sa)
//     -> 0 on success; sa[0..n) = suffix array of text (alphabet 0..255,
//        suffixes compared with implicit terminator < all characters).
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Generic SA-IS over an integer string `s` of length n with alphabet size K.
// s must be strictly positive values (0 is reserved for the sentinel we
// append internally at index n).
template <typename T>
void sais_core(const T* s, int32_t* sa, int32_t n, int32_t K) {
    // n includes the sentinel at position n-1 (s[n-1] == 0, unique minimum).
    std::vector<bool> is_s(n);
    is_s[n - 1] = true;
    for (int32_t i = n - 2; i >= 0; i--) {
        is_s[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && is_s[i + 1]);
    }
    auto is_lms = [&](int32_t i) {
        return i > 0 && is_s[i] && !is_s[i - 1];
    };

    std::vector<int32_t> bend(K), bstart(K);
    auto compute_bounds = [&]() {
        std::vector<int32_t> cnt(K, 0);
        for (int32_t i = 0; i < n; i++) cnt[s[i]]++;
        int32_t acc = 0;
        for (int32_t c = 0; c < K; c++) {
            bstart[c] = acc;
            acc += cnt[c];
            bend[c] = acc;
        }
    };

    auto induce = [&](const std::vector<int32_t>& lms) {
        std::fill(sa, sa + n, -1);
        compute_bounds();
        std::vector<int32_t> tail(bend);
        // place LMS suffixes at bucket tails (in given order, backwards)
        for (int32_t i = (int32_t)lms.size() - 1; i >= 0; i--) {
            int32_t p = lms[i];
            sa[--tail[s[p]]] = p;
        }
        // induce L-type from left to right
        std::vector<int32_t> head(bstart);
        for (int32_t i = 0; i < n; i++) {
            int32_t p = sa[i];
            if (p > 0 && !is_s[p - 1]) sa[head[s[p - 1]]++] = p - 1;
        }
        // induce S-type from right to left
        tail = bend;
        for (int32_t i = n - 1; i >= 0; i--) {
            int32_t p = sa[i];
            if (p > 0 && is_s[p - 1]) sa[--tail[s[p - 1]]] = p - 1;
        }
    };

    // collect LMS positions in text order
    std::vector<int32_t> lms_pos;
    for (int32_t i = 1; i < n; i++)
        if (is_lms(i)) lms_pos.push_back(i);

    induce(lms_pos);

    // extract sorted LMS positions
    std::vector<int32_t> sorted_lms;
    sorted_lms.reserve(lms_pos.size());
    for (int32_t i = 0; i < n; i++)
        if (sa[i] > 0 && is_lms(sa[i])) sorted_lms.push_back(sa[i]);

    // name LMS substrings
    int32_t m = (int32_t)lms_pos.size();
    std::vector<int32_t> name(n, -1);
    int32_t names = 0;
    int32_t prev = -1;
    for (int32_t idx = 0; idx < (int32_t)sorted_lms.size(); idx++) {
        int32_t p = sorted_lms[idx];
        if (prev < 0) {
            name[p] = names++;
        } else {
            // compare LMS substrings at prev and p
            bool same = true;
            for (int32_t d = 0;; d++) {
                if (s[prev + d] != s[p + d] ||
                    is_s[prev + d] != is_s[p + d]) {
                    same = false;
                    break;
                }
                if (d > 0 && (is_lms(prev + d) || is_lms(p + d))) {
                    same = is_lms(prev + d) && is_lms(p + d);
                    break;
                }
            }
            if (!same) names++;
            name[p] = names - 1;
        }
        prev = p;
    }

    std::vector<int32_t> order(m);
    if (names < m) {
        // recurse on the reduced string of LMS names. The final LMS is the
        // outer sentinel position whose name is uniquely 0, so the reduced
        // string ends with its own unique minimum — the invariant
        // sais_core requires.
        std::vector<int32_t> s1(m);
        int32_t j = 0;
        for (int32_t i = 1; i < n; i++)
            if (is_lms(i)) s1[j++] = name[i];
        std::vector<int32_t> sa1(m);
        sais_core<int32_t>(s1.data(), sa1.data(), m, names);
        for (int32_t i = 0; i < m; i++) order[i] = lms_pos[sa1[i]];
    } else {
        // all names unique: radix by name
        for (int32_t i = 0; i < m; i++) order[name[lms_pos[i]]] = lms_pos[i];
    }
    induce(order);
}

}  // namespace

extern "C" {

int bt2tpu_sais(const uint8_t* text, int32_t n, int32_t* sa) {
    if (n <= 0) return 0;
    // append sentinel: work over s[i] = text[i] + 1, s[n] = 0
    std::vector<uint16_t> s(n + 1);
    for (int32_t i = 0; i < n; i++) s[i] = (uint16_t)text[i] + 1;
    s[n] = 0;
    std::vector<int32_t> sa_full(n + 1);
    sais_core<uint16_t>(s.data(), sa_full.data(), n + 1, 257);
    // drop the sentinel suffix (always first)
    std::memcpy(sa, sa_full.data() + 1, sizeof(int32_t) * n);
    return 0;
}

}  // extern "C"
