#!/bin/sh
# Build the native IO layer: libpcrtpu_native.so next to this script.
set -e
cd "$(dirname "$0")"
${CXX:-g++} -O3 -shared -fPIC -o libpcrtpu_native.so pcd_io.cpp
echo "built $(pwd)/libpcrtpu_native.so"
