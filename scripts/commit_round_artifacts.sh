#!/usr/bin/env bash
# Commit the round's measurement artifacts (bench/correctness/leakcheck
# records). Invoked by graft.Bench as the last act of every full-surface
# run, and safe to run by hand. Only ever touches the named artifact
# files — never source — and exits 0 when there is nothing to commit.
#
# FRESHNESS FENCE (ADVICE r13): the automatic invocation must only sweep
# artifacts a run of this round actually produced — a stale hand-edited
# file from a previous session is SKIPPED (with a visible notice), not
# silently committed under the artifact message. Pass --all to lift the
# fence for deliberate manual sweeps.
set -u
cd "$(dirname "$0")/.."

MAX_AGE_SECS=$((12 * 3600))
ALL=0
[ "${1:-}" = "--all" ] && ALL=1
NOW=$(date +%s)

FILES=()
for f in bench.json bench_full.json BENCH_r*.json CORRECTNESS_r*.json \
         LEAKCHECK.json COPYCHECK.json SCALING.md; do
  # glob may be literal when nothing matches
  [ -e "$f" ] || continue
  # dirty (tracked + modified) or untracked
  if ! git diff --quiet -- "$f" 2>/dev/null \
     || [ -n "$(git ls-files --others --exclude-standard -- "$f")" ]; then
    if [ "$ALL" -eq 0 ]; then
      mtime=$(stat -c %Y "$f" 2>/dev/null || stat -f %m "$f")
      if [ $((NOW - mtime)) -gt "$MAX_AGE_SECS" ]; then
        echo "skipping stale dirty artifact (mtime >12h old; --all to force): $f" >&2
        continue
      fi
    fi
    FILES+=("$f")
  fi
done

if [ ${#FILES[@]} -eq 0 ]; then
  echo "no artifact changes to commit"
  exit 0
fi

git add -- "${FILES[@]}" || exit 0
if git diff --cached --quiet -- "${FILES[@]}"; then
  echo "no artifact changes staged"
  exit 0
fi
# commit with an EXPLICIT pathspec: this script runs automatically at the
# end of every full bench run, and a bare `git commit` would silently
# sweep up anything the user had previously staged under the artifact
# message. With the pathspec, pre-staged unrelated files stay staged.
git commit -q -m "Record measurement artifacts: ${FILES[*]}" -- "${FILES[@]}" || exit 0
echo "committed: ${FILES[*]}"
