#!/bin/sh
# Build the native runtime components into pulse_tpu/native/.
set -e
cd "$(dirname "$0")/.."
mkdir -p pulse_tpu/native
g++ -O3 -fPIC -shared -std=c++17 -o pulse_tpu/native/libmotion_codec.so \
    native/motion_codec.cc
echo "built pulse_tpu/native/libmotion_codec.so"
