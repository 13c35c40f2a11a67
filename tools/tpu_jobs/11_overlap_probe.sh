#!/bin/bash
# Overlap falsification probe (tools/overlap_probe.py): can one program
# overlap the issue-bound gather tail with the MXU-bound hub core?
# Small shapes, 4 small compiles — runs after the bench warm.
cd /root/repo
timeout 2400 python tools/overlap_probe.py
