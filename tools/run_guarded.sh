#!/usr/bin/env bash
# Run a command; if it is killed or fails, delete any XLA compilation-cache
# entries it wrote after launch.  A process killed MID-COMPILE can leave a
# TRUNCATED entry in the persistent cache, and XLA-CPU segfaults
# deserializing it on the next read (observed r4: pytest SIGSEGV in
# compilation_cache get_executable_and_time; pitfall documented in
# CLAUDE.md).  VERDICT r4 item 10: make the cleanup automatic instead of a
# manual ls-and-delete.
#
# Usage: tools/run_guarded.sh <command...>
# Caches guarded: $JAX_COMPILATION_CACHE_DIR (default /root/repo/.jax_cache)
# and /root/repo/.jax_cache_cpu.

set -u
CACHES=("${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}" /root/repo/.jax_cache_cpu)
STAMP="$(mktemp)"
trap 'rm -f "$STAMP"' EXIT

"$@"
rc=$?

if [ $rc -ne 0 ]; then
    for d in "${CACHES[@]}"; do
        [ -d "$d" ] || continue
        # anything written after launch by the failed/killed run is suspect
        n=$(find "$d" -maxdepth 1 -type f -newer "$STAMP" -print -delete | wc -l)
        [ "$n" -gt 0 ] && echo "run_guarded: dropped $n suspect cache entrie(s) from $d (rc=$rc)" >&2
    done
fi
exit $rc
