#!/bin/bash
# Build the GP breeding core. Run from anywhere.
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 evolve.cpp -o libevolve.so
echo "built $(pwd)/libevolve.so"
