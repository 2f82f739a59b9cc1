#!/bin/bash
# Rebuild the reference baseline binary and refresh BASELINE_MEASURED.json.
set -e
cd "$(dirname "$0")"
EIG=/opt/venv/lib/python3.12/site-packages/tensorflow/include
g++ -O3 -std=c++17 -DNDEBUG -DEIGEN_NO_DEBUG -DCONEX_VERBOSE=0 \
    -include cassert -include array -I$EIG -I/root/reference \
    bench_reference.cc /root/reference/conex/*.cc -o bench_reference
g++ -O2 -std=c++17 -DNDEBUG -DEIGEN_NO_DEBUG -DCONEX_VERBOSE=0 \
    -include cassert -include array -I$EIG -I/root/reference \
    dump_trajectory.cc /root/reference/conex/*.cc -o dump_trajectory
for cfg in "50 25 8 1" "100 50 4 1" "100 100 4 1"; do
  taskset -c 0 ./bench_reference $cfg
done
