#!/bin/bash
# Build the reference parity harness against:
#  - the UNMODIFIED reference headers (/root/reference/include, read-only)
#  - Eigen as shipped inside the tensorflow wheel (incl. unsupported/)
#  - our 30-line chi-squared stub (stub/boost/...)
set -euo pipefail
cd "$(dirname "$0")"
TF_INC=$(python -c "import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), 'include'))" 2>/dev/null \
  || echo /opt/venv/lib/python3.12/site-packages/tensorflow/include)
g++ -O2 -std=c++14 -Wno-deprecated-declarations \
  -I /root/reference/include -I "$TF_INC" -I ./stub \
  main.cpp -o ref_harness
echo "built $(pwd)/ref_harness"
