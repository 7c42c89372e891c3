#!/bin/sh
# Build the native runtime libraries (libv3dpng.so, optional libv3dav.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    png16.cc mp4box.cc -lz -o libv3dpng.so
echo "built $(pwd)/libv3dpng.so"
if printf '#include <libavcodec/avcodec.h>\n' | g++ -E -x c++ - >/dev/null 2>&1; then
    g++ -O3 -march=native -fPIC -shared -std=c++17 avio.cc \
        -lavformat -lavcodec -lavutil -lswresample -lswscale -o libv3dav.so
    echo "built $(pwd)/libv3dav.so"
else
    echo "libav dev headers not found; skipping libv3dav.so"
fi
