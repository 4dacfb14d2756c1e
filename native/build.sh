#!/usr/bin/env bash
# Build the native runtime components -> native/lib/
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -std=c++17 -shared -fPIC -Wall loader.cpp -o lib/libofloader.so -ljpeg
echo "built: $(ls lib)"
