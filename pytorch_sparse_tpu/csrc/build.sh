#!/bin/sh
# Build the native host library (no torch, no pybind; plain C ABI).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -fPIC -shared -std=c++17 \
    -o libsparse_tpu_native.so native.cpp
echo "built $(pwd)/libsparse_tpu_native.so"
