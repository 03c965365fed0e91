#!/bin/sh
# Build the native data-prep shared library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -funroll-loops -fPIC -shared -std=c++17 \
    -o libktdataprep.so dataprep.cpp
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -o libktsgfscan.so sgfscan.cpp
echo "built $(pwd)/libktdataprep.so and libktsgfscan.so"
