#!/bin/bash
# Round-5 parity production queue (VERDICT r4 #1/#4): the gate arm, the
# all-off diagnosis arm, one-at-a-time ablations, then a 5-seed null.
# Serialized — one TPU process at a time.
cd /root/repo
set -x
python tools/full_recipe_parity.py --phase production --arm f32     --out runs/frp5 >> runs/frp5/q_f32.log 2>&1
python tools/full_recipe_parity.py --phase production --arm pure    --out runs/frp5 >> runs/frp5/q_pure.log 2>&1
python tools/full_recipe_parity.py --phase production --arm sv0     --out runs/frp5 >> runs/frp5/q_sv0.log 2>&1
python tools/full_recipe_parity.py --phase production --arm sb0     --out runs/frp5 >> runs/frp5/q_sb0.log 2>&1
python tools/full_recipe_parity.py --phase production --arm stride1 --out runs/frp5 >> runs/frp5/q_stride1.log 2>&1
for S in 1001 1002 1003 1004; do
  python tools/full_recipe_parity.py --phase production --arm f32 --seed $S --out runs/frp5 >> runs/frp5/q_s$S.log 2>&1
done
echo QUEUE_DONE
