#!/usr/bin/env bash
# Build the reference-oracle harness against the read-only reference tree.
# Produces tools/ref_harness/bin/{ref_serial,ref_parallel}.
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p bin
REF=/root/reference/Code
PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")

build() {
  local variant=$1 out=$2; shift 2
  local src="$REF/$variant/src"
  g++ -O3 -fopenmp -w -std=c++14 "-I$src" "-I$PYINC" "$@" \
    main.cpp "$src/Coarse2FineFlowWrapper.cpp" "$src/OpticalFlow.cpp" \
    "$src/GaussianPyramid.cpp" "$src/Stochastic.cpp" \
    -o "bin/$out" -lm
}

build Serial ref_serial
build Parallel ref_parallel -DREF_PARALLEL
echo "built: $(ls bin)"
