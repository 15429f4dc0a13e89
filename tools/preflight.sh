#!/bin/bash
# Environment preflight — run FIRST each session/round.
# Loads every driver-provided table via the graft loaders (including the
# events ts normalization) and prints schema + row count; exits nonzero on
# the first unloadable table. A regenerated /root/testdata with a new
# schema flavor becomes a one-line diagnosis instead of 161 downstream
# analysis errors (see round 8).
#
# Usage: tools/preflight.sh [sfDir]   (default /root/testdata/sf0.001)
set -e
cd "$(dirname "$0")/.."
exec tools/run.sh graft.Preflight "${1:-/root/testdata/sf0.001}"
