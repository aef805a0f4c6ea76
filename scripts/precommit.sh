#!/bin/sh
# Pre-commit gate (round 16, VERDICT r15 Next #3): r15 session 3
# committed a red HEAD (q323 failing FlatOutputSpec) because no suite
# ran before the commit — make the discipline mechanical, not a habit.
#
# Usage:
#   scripts/precommit.sh                 # compile + FlatOutputSpec
#   scripts/precommit.sh graft.AnalyticsSpec graft.FunctionsSpec
#                                        # compile + FlatOutputSpec +
#                                        # the touched specs
#   scripts/precommit.sh --full          # the whole suite (session end)
#
# Every session's LAST commit must follow a --full run; record the run
# in NOTES_r{N}.md.
set -e
cd "$(dirname "$0")/.."
if [ "$1" = "--full" ]; then
  exec sbt -batch test
fi
SPECS="graft.FlatOutputSpec $*"
exec sbt -batch compile "testOnly $SPECS"
