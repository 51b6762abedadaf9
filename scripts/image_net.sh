#!/bin/bash
# Canonical FP8 E3M4 PTQ run (~ reference scripts/image_net.sh:24-59 flag set).
set -e

image_dir=${IMAGE_DIR:-}
model_dir=${MODEL_DIR:-}
architecture=${ARCHITECTURE:-mobilenet_v2_quantized}
batch_size=${BATCH_SIZE:-16}
seed=${SEED:-10}
n_bits=${N_BITS:-8}
expo_width=${EXPO_WIDTH:-3}
mant_width=${MANT_WIDTH:-4}
dnsmp_factor=${DNSMP_FACTOR:-3}
approx_output_dir=${APPROX_OUTPUT_DIR:-approx_output}

data_flags="--synthetic-data"
if [ -n "$image_dir" ]; then data_flags="--images-dir ${image_dir}"; fi
model_flags=""
if [ -n "$model_dir" ]; then model_flags="--model-dir ${model_dir}"; fi

python image_net.py validate-quantized \
    ${data_flags} \
    --architecture ${architecture} \
    --batch-size ${batch_size} \
    --seed ${seed} \
    ${model_flags} \
    --n-bits ${n_bits} \
    --load-type fp32 \
    --quant-setup all \
    --qmethod fp_quantizer \
    --per-channel \
    --fp8-mantissa-bits ${mant_width} \
    --fp8-set-maxval \
    --no-fp8-mse-include-mantissa-bits \
    --weight-quant-method current_minmax \
    --act-quant-method allminmax \
    --num-est-batches 1 \
    --quantize-input \
    --no-approx_flag \
    --no-quantize-after-mult-and-add \
    --res-quantizer-flag \
    --original-quantize-res \
    --expo-width ${expo_width} \
    --mant-width ${mant_width} \
    --dnsmp-factor ${dnsmp_factor} \
    --approx-output-dir ${approx_output_dir}
