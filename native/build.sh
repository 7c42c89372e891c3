#!/bin/sh
# Build the native runtime library (libv3dpng.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    png16.cc mp4box.cc -lz -o libv3dpng.so
echo "built $(pwd)/libv3dpng.so"
