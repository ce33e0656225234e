#!/bin/bash
# Example launches (the reference's test.sh equivalent — its per-GPU nohup
# jobs become sequential runs; scale-out on TPU goes through jax.sharding
# meshes inside the process instead of shell-level process placement).
set -e
DATA=${1:-/data/imagenet}

python test_quant.py deit_small "$DATA" --quant --quant-method minmax
python test_quant.py deit_base  "$DATA" --quant --quant-method minmax
python test_quant.py vit_base   "$DATA" --quant --quant-method omse
python test_quant.py swin_tiny  "$DATA" --quant
# real int8 execution + mixed precision search
python test_quant.py deit_small "$DATA" --quant --int-path
python test_quant.py deit_small "$DATA" --quant --mixed
