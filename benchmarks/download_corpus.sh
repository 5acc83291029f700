#!/usr/bin/env bash
# Fetch the Silesia corpus into bench_files/ (reference
# benchmarks/download_corpus_bench.sh parity). Requires network access;
# benchmarks/compare.py and bench.py fall back to the in-repo corpora and a
# synthesized 10 MB text corpus when these files are absent.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p bench_files
cd bench_files
if [ ! -f dickens ]; then
  curl -fLO http://sun.aei.polsl.pl/~sdeor/corpus/silesia.zip \
    || curl -fLO https://sun.aei.polsl.pl//~sdeor/corpus/silesia.zip
  unzip -o silesia.zip
  rm -f silesia.zip
fi
ls -la
