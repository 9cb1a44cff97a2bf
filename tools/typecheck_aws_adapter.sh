#!/usr/bin/env bash
# Typecheck the aws-adapter in the zero-egress sandbox: compile the
# vendored aws-sdk-v2 SIGNATURE STUBS (aws-adapter/stub-sdk/java) into a
# jar, then compile the adapter's main AND test sources against it via
# the existing GRAFT_AWS_SDK_JARS wiring in build.sbt. This catches any
# typo'd SDK method name, wrong arity, or type mismatch that
# parser-level checks cannot — the gap VERDICT r13 "What's missing #1"
# recorded. In an SDK-present environment, point GRAFT_AWS_SDK_JARS at
# the real jars instead; the stub jar must NEVER be on a runtime
# classpath (every stub body throws).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=aws-adapter/stub-sdk/target
rm -rf "$OUT"
mkdir -p "$OUT/classes"
find aws-adapter/stub-sdk/java -name '*.java' | sort > "$OUT/sources.txt"
javac -encoding UTF-8 -d "$OUT/classes" @"$OUT/sources.txt"
jar cf "$OUT/aws-sdk-v2-signature-stubs.jar" -C "$OUT/classes" .

GRAFT_AWS_SDK_JARS="$OUT" sbt -batch "awsAdapter/compile" "awsAdapter/Test/compile"

{
  echo "aws-adapter typecheck: OK ($(date -u +%Y-%m-%dT%H:%M:%SZ))"
  echo "stub sources: $(wc -l < "$OUT/sources.txt") files, sha256 of concatenation:"
  sort "$OUT/sources.txt" | xargs cat | sha256sum
} | tee "$OUT/typecheck-ok.txt"
