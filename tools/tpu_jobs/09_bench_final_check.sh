#!/bin/bash
# Final driver-contract validation: bench.py end-to-end after the round-4
# code consolidation — confirms the prep npz + compile caches still hit
# (same keys, same HLO) so the driver's round-end run is fast.
cd /root/repo
timeout 7200 python bench.py
