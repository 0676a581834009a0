#!/bin/bash
# Round-4 chip queue — superseded by the round-5 interleaved queue
# (scripts/r5_chip_queue.sh). The relay watcher invokes this path, so it
# forwards verbatim; with no args the r5 default interleaved order runs.
# Round-4 aggregate stage names are expanded to their r5 chunk stages.
mapped=()
for s in "$@"; do case $s in
  flagship) mapped+=(flagship_1 flagship_2 flagship_3 flagship_4 flagship_5) ;;
  causal)   mapped+=(causal_1 causal_2 causal_3) ;;
  s3)       mapped+=(s3_1 s3_2 s3_3 s3_4) ;;
  *)        mapped+=("$s") ;;
esac; done
exec bash "$(dirname "$0")/r5_chip_queue.sh" ${mapped[@]+"${mapped[@]}"}
