#!/usr/bin/env python
"""Render experiment sweep scripts across flag combinations.

~ reference ``scripts/generated_scripts.py`` (bash-template renderer over
approx-flag combos). Generates one shell script per configuration under
``scripts/generated/``; run them with ``run_sweep.py``, clean with
``delete_sweep.py``.
"""

import argparse
import itertools
import os
import stat

TEMPLATE = """#!/bin/bash
set -e
python image_net.py validate-quantized \\
    {images_flag} \\
    --architecture {architecture} \\
    --batch-size {batch_size} \\
    --seed {seed} \\
    {model_flag} \\
    --n-bits {n_bits} \\
    --load-type fp32 \\
    --quant-setup all \\
    --qmethod fp_quantizer \\
    --per-channel \\
    --fp8-mantissa-bits {mant_width} \\
    --fp8-set-maxval \\
    --no-fp8-mse-include-mantissa-bits \\
    --weight-quant-method current_minmax \\
    --act-quant-method allminmax \\
    --num-est-batches 1 \\
    --quantize-input \\
    {approx_flag} \\
    {qama_flag} \\
    --res-quantizer-flag \\
    {oqr_flag} \\
    --expo-width {expo_width} \\
    --mant-width {mant_width} \\
    --dnsmp-factor {dnsmp_factor} \\
    {withcomp_flag} \\
    {with_approx_flag} \\
    {s2nn2s_flag} \\
    {quant_btw_flag} \\
    --approx-output-dir {approx_output_dir}
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out-dir", default=os.path.join(os.path.dirname(__file__),
                                                     "generated"))
    p.add_argument("--images-dir", default=None)
    p.add_argument("--model-dir", default=None)
    p.add_argument("--architecture", default="mobilenet_v2_quantized_approx")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=10)
    p.add_argument("--n-bits", type=int, default=8)
    p.add_argument("--approx-output-dir", default="approx_output")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)

    # the swept axes (generated_scripts.py:91-130): format x dnsmp x comp x
    # approx-path toggles
    formats = [(4, 3, [3]), (3, 4, [3, 4]), (2, 5, [3, 4, 5])]
    toggles = [
        # (approx, qama, original_quantize_res, with_comp, with_approx,
        #  s2nn2s, quant_btw)
        (True, False, False, True, True, True, True),
        (True, False, False, False, True, True, True),
        (False, True, True, False, False, False, True),
        (False, False, True, False, False, False, True),
    ]

    count = 0
    for (ew, mw, dnsmps), tog in itertools.product(formats, toggles):
        approx, qama, oqr, comp, wapprox, s2n, qbtw = tog
        if not approx and len(dnsmps) > 1:
            dnsmps = dnsmps[:1]  # dnsmp only matters on the approx path
        for d in dnsmps:
            name = (f"E{ew}M{mw}D{d}"
                    f"_{'approx' if approx else 'qama' if qama else 'plain'}"
                    f"{'_comp' if comp else ''}.sh")
            body = TEMPLATE.format(
                images_flag=(f"--images-dir {args.images_dir}"
                             if args.images_dir else "--synthetic-data"),
                model_flag=(f"--model-dir {args.model_dir}"
                            if args.model_dir else ""),
                architecture=args.architecture,
                batch_size=args.batch_size,
                seed=args.seed,
                n_bits=args.n_bits,
                expo_width=ew,
                mant_width=mw,
                dnsmp_factor=d,
                approx_flag="--approx_flag" if approx else "--no-approx_flag",
                qama_flag=("--quantize-after-mult-and-add" if qama
                           else "--no-quantize-after-mult-and-add"),
                oqr_flag=("--original-quantize-res" if oqr
                          else "--no-original-quantize-res"),
                withcomp_flag="--withComp" if comp else "--no-withComp",
                with_approx_flag=("--with_approx" if wapprox
                                  else "--no-with_approx"),
                s2nn2s_flag=("--with_s2nn2s_opt" if s2n
                             else "--no-with_s2nn2s_opt"),
                quant_btw_flag=("--quant_btw_mult_accu" if qbtw
                                else "--no-quant_btw_mult_accu"),
                approx_output_dir=args.approx_output_dir,
            )
            path = os.path.join(args.out_dir, name)
            with open(path, "w") as f:
                f.write(body)
            os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
            count += 1
    print(f"generated {count} scripts in {args.out_dir}")


if __name__ == "__main__":
    main()
