#!/bin/bash
# Per-file test runner: one pytest process per test file.
#
# Optional belt-and-braces alongside the vm.max_map_count bump in
# conftest.py: a long JAX process accumulates one LLVM-JIT'd executable
# per XLA compile, and at the kernel-default max_map_count (65530) the
# process exhausts its mmap budget and the next compile segfaults
# (reproduced at the 34th test of test_tree.py; fixed at 1048576 —
# conftest.py bumps it when running as root). Process-per-file keeps
# each process's map count low even where the sysctl can't be raised.
# Usage: tests/run_suite.sh [--runslow]
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
  echo "== $f"
  python -m pytest "$f" -q "$@" || { echo "FAILED: $f"; fail=1; }
done
exit $fail
