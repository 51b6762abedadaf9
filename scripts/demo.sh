#!/bin/bash
# Demo pipeline smoke test (~ reference scripts/demo.sh).
set -e
python image_net.py validate-quantized-demo \
    --architecture demo_quantized \
    --qmethod fp_quantizer \
    --fp8-set-maxval \
    --res-quantizer-flag \
    --original-quantize-res \
    --batch-size 8 \
    --seed 10
