#!/usr/bin/env python
"""ImageNet validation CLI (~ reference image_net.py).

Usage mirrors the reference, e.g. (scripts/image_net.sh flag set):

  python image_net.py validate-quantized \\
      --images-dir /data/imagenet --architecture mobilenet_v2_quantized \\
      --qmethod fp_quantizer --per-channel --quantize-input \\
      --weight-quant-method current_minmax --act-quant-method allminmax \\
      --fp8-set-maxval --no-fp8-mse-include-mantissa-bits \\
      --res-quantizer-flag --original-quantize-res \\
      --expo-width 3 --mant-width 4 --batch-size 16 --seed 10
"""

import sys

from fp8_quantization_tpu.cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
