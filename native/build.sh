#!/bin/sh
# Build the native runtime shared library.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libdvio_runtime.so \
    dvio_runtime.cpp -lpng -ljpeg -lz -lpthread
echo "built $(pwd)/libdvio_runtime.so"
