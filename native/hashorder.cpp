// Iteration order of a libstdc++ std::unordered_map keyed like the
// reference's KmerMatchMap (KmerOverlaps.cpp:60-66: hash = BWT row,
// equality = (row, is_reverse)).  The reference iterates that map to decide
// which k-mer anchor survives per matched read, so byte-parity of the
// overlap corrector requires replaying the exact bucket order.  Compiling
// against the same libstdc++ is the only faithful oracle — the order
// depends on the prime rehash policy and front-of-bucket insertion, not on
// anything the reference's algorithm specifies.
#include <cstddef>
#include <cstdint>
#include <unordered_map>

namespace {
struct Key {
    uint64_t row;
    uint8_t rc;
};
struct RowHash {
    size_t operator()(const Key& k) const { return k.row; }
};
struct RowRcEq {
    bool operator()(const Key& a, const Key& b) const {
        return a.row == b.row && a.rc == b.rc;
    }
};
}  // namespace

extern "C" long hash_iter_order(const uint64_t* rows, const uint8_t* rcs,
                                long n, long* out) {
    std::unordered_map<Key, long, RowHash, RowRcEq> m;
    for (long i = 0; i < n; ++i)
        m.insert({{rows[i], rcs[i]}, i});
    long j = 0;
    for (const auto& kv : m)
        out[j++] = kv.second;
    return j;
}
