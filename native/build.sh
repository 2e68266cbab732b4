#!/usr/bin/env bash
# Build the native data-loading runtime (libmslam_loader.so).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -pthread loader.cpp -lz \
    -o libmslam_loader.so
echo "built native/libmslam_loader.so"
