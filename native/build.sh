#!/bin/sh
# Build the native chemistry graph-builder.
set -e
cd "$(dirname "$0")"
g++ -O3 -fopenmp -shared -fPIC -std=c++17 chemgraph.cpp chemscore.cpp \
        -o libchemgraph.so \
    || g++ -O3 -shared -fPIC -std=c++17 chemgraph.cpp chemscore.cpp \
        -o libchemgraph.so
echo "built $(pwd)/libchemgraph.so"
