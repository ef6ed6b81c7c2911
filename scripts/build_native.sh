#!/bin/sh
# Build the native video IO runtime -> native/libmeshflow_videoio.so
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -funroll-loops -fno-math-errno -fPIC -shared \
    -std=c++17 \
    native/videoio.cpp native/warp.cpp \
    -o native/libmeshflow_videoio.so \
    -lavformat -lavcodec -lavutil -lswscale -lpthread
echo "built native/libmeshflow_videoio.so"
