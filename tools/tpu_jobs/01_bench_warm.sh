#!/bin/bash
# Warm the round-end driver bench: exact same command/config the driver
# runs, so the prep npz + XLA compile caches are hot. Gated on the
# host-side prebuild having produced the int8/12GiB reddit prep cache.
until grep -q "reddit bench prep int8/12GiB" /tmp/prebuild.log 2>/dev/null; do
  sleep 30
done
cd /root/repo
timeout 9000 python bench.py
