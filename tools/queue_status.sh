#!/bin/bash
# One-glance round-4 queue health: active job, log freshness, last lines.
date -u +"now %T"
for q in runs/r4/queue.out runs/r4/queue_watch.out; do
  [ -f "$q" ] && echo "== $q: $(tail -1 "$q")"
done
# newest log under runs/r4 = the active job
L=$(ls -t runs/r4/*.log runs/r4/seed2/*.log runs/r4/fixed/*.log 2>/dev/null | head -1)
if [ -n "$L" ]; then
  AGE=$(( $(date +%s) - $(stat -c %Y "$L") ))
  echo "== active $L (age ${AGE}s)"
  tail -2 "$L" | cut -c1-160
fi
ps aux | awk '/cmx.cli|ab_cmunet/ && !/awk/ {print "== pid", $2, $13, $14}'
