#!/bin/bash
# Scale-stress q127/q72/q124 on an sf1-equivalent (10x sf0.1) documents
# corpus. Generates the corpus on first run (md5-derived, reproducible),
# prints one STRESS json line per corpus. See graft.Stress scaladoc;
# numbers are recorded in PLANS.md.
set -e
cd "$(dirname "$0")/.."
exec sbt -batch "runMain graft.Stress ${1:-/tmp/graft_stress}"
