#!/usr/bin/env bash
# Build the native ETL kernels shared library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o libetl_kernels.so etl_kernels.cc
echo "built $(pwd)/libetl_kernels.so"
