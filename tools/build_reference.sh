#!/bin/bash
# Build the reference GAML binary from the read-only mount for differential
# parity testing, substituting minimal stubs for its Boost dependencies
# (string split + no-op archives; the vendored serialization headers are
# replaced by plain <unordered_map>/<unordered_set> includes).
#
# Usage: tools/build_reference.sh [build_dir]   (default /tmp/gaml_refbuild)
set -e
REF=${GAML_REFERENCE_DIR:-/root/reference}
BUILD=${1:-/tmp/gaml_refbuild}
HERE=$(cd "$(dirname "$0")" && pwd)

mkdir -p "$BUILD"
cp "$REF"/*.cc "$REF"/*.h "$REF"/*.hpp "$BUILD"/
rm -f "$BUILD"/testrep.cc "$BUILD"/unordered_collections_load_imp.hpp \
      "$BUILD"/unordered_collections_save_imp.hpp
cp "$HERE"/refstub/unordered_map.hpp "$HERE"/refstub/unordered_set.hpp "$BUILD"/

# UB fix: the reference-returning GetAligmentForSubpath returns a reference
# to a temporary on cache miss (graph.cc:1478) — usually reads as empty by
# luck, segfaults on some layouts (observed on the starting_assembly path).
# Pin the intended empty-on-miss behavior.
sed -i 's|return vector<Aligment>();|static const vector<Aligment> kEmptyAligments; return kEmptyAligments;|' "$BUILD"/graph.cc

g++ -O2 -std=c++11 -w -I"$HERE"/refstub -include cstring -include cstdio \
    "$BUILD"/gaml.cc "$BUILD"/graph.cc "$BUILD"/moves.cc \
    "$BUILD"/input_output.cc "$BUILD"/graph_from_assembly.cc \
    -o "$BUILD"/gaml
echo "$BUILD/gaml"
