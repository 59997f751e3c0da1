#!/bin/sh
# Build the native tier (libeegcache.so, libeegring.so) next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -fPIC -shared -pthread eegcache.cpp -o libeegcache.so
echo "built $(pwd)/libeegcache.so"
g++ -O3 -std=c++17 -fPIC -shared -pthread eegring.cpp -o libeegring.so
echo "built $(pwd)/libeegring.so"
cc -O2 -std=c99 isd_client.c -o isd_client
echo "built $(pwd)/isd_client"
