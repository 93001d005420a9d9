#!/bin/bash
# Scratch build of the GPL reference (/root/reference) for golden outputs.
# The reference needs autotools + google-sparsehash, neither of which is in
# this image; we generate config.h by hand and shim google::sparse_hash_* as
# std::unordered_* subclasses (same substitution earlier rounds used — byte
# parity of hash-order-dependent outputs is replayed via native/hashorder.so
# against libstdc++ buckets, so the shim IS the semantics we match).
# Build tree lives entirely under .refbuild/ (gitignored); /root/reference
# itself is never written.
set -e
REF=/root/reference
B="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$B/obj" "$B/include/google"

cat > "$B/include/config.h" <<'EOF'
#ifndef CONFIG_H
#define CONFIG_H
#define PACKAGE_NAME "StriDe"
#define PACKAGE_VERSION "0.0.1"
#define PACKAGE_BUGREPORT "ythuang@cs.ccu.edu.tw"
#define AUTHOR "Yao-Ting Huang"
#define HAVE_UNORDERED_MAP 1
#define HAVE_GOOGLE_SPARSE_HASH_MAP 1
#define HAVE_OPENMP 1
#define HAVE_CLOCK_GETTIME 1
#endif
EOF

shim() {
cat > "$B/include/google/$1" <<EOF
#pragma once
#include <unordered_$2>
namespace google {
template <class K$3, class H = std::hash<K>, class E = std::equal_to<K>,
          class A = std::allocator<$4>>
class $5 : public std::unordered_$2<K$6, H, E, A> {
 public:
  typedef std::unordered_$2<K$6, H, E, A> base;
  using base::base;
  void set_deleted_key(const K&) {}
  void set_empty_key(const K&) {}
  void resize(size_t n) { this->rehash(n); }
};
}  // namespace google
EOF
}
shim sparse_hash_map map ", class V" "std::pair<const K, V>" sparse_hash_map ", V"
shim dense_hash_map  map ", class V" "std::pair<const K, V>" dense_hash_map  ", V"
shim sparse_hash_set set "" "K" sparse_hash_set ""
shim dense_hash_set  set "" "K" dense_hash_set  ""

# 2015-era code calls abs() on unsigned types; newer libstdc++ makes those
# calls ambiguous/ill-formed.  Preincluded into every TU via -include below.
cat > "$B/include/refshim.h" <<'EOF'
#pragma once
#include <cstdlib>
#include <cstdint>
static inline long long abs(unsigned long long x) { long long s = (long long)x; return s < 0 ? -s : s; }
static inline long abs(unsigned long x) { long s = (long)x; return s < 0 ? -s : s; }
static inline unsigned int abs(unsigned int x) { return x; }
EOF

MODULES="Util SQG Bigraph Algorithm StringGraph Concurrency SuffixTools FMIndexWalk PacBio Thirdparty Thirdparty/rollinghash Thirdparty/ropebwt2 StriDe"
INC="-I$B/include"
for m in $MODULES; do INC="$INC -I$REF/$m"; done

CXX=${CXX:-g++}
CC=${CC:-gcc}
# old (2015-era) C++: preinclude headers newer libstdc++ no longer chains in
CXXFLAGS="-O3 -std=c++11 -fopenmp -fpermissive -Wno-unknown-pragmas -w -include string -include limits -include cstring -include array -include cstdint -include refshim.h $INC"
CFLAGS="-O3 -fopenmp -w $INC"

compile_one() {
  src=$1
  obj="$B/obj/$(echo "${src#$REF/}" | tr / _)"
  obj="${obj%.*}.o"
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
    case "$src" in
      *.c) $CC -c $CFLAGS "$src" -o "$obj" ;;
      *) $CXX -c $CXXFLAGS "$src" -o "$obj" ;;
    esac
  fi
}

SRCS=$(for m in $MODULES; do find "$REF/$m" -maxdepth 1 \( -name "*.cpp" -o -name "*.c" -o -name "*.C" \) ! -name "main.c"; done)
NPROC=$(nproc)
i=0
for s in $SRCS; do
  compile_one "$s" &
  i=$((i+1))
  if [ $((i % NPROC)) -eq 0 ]; then wait; fi
done
wait

$CXX $CXXFLAGS -o "$B/stride" "$B"/obj/*.o -lz -lpthread -fopenmp
echo "built $B/stride"
"$B/stride" --version 2>/dev/null | head -2 || true
