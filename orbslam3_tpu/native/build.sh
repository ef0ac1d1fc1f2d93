#!/bin/bash
# Build the native ingest runtime shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 ingest.cpp \
    -lpng -lz -lpthread -o libingest.so
echo "built $(pwd)/libingest.so"
