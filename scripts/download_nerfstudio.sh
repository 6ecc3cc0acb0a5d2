#!/bin/bash
# Download the nerfstudio capture scenes used by configs/nerf_studio/*.py.
# Counterpart of the reference's scripts/download_nerfstudio.sh (same
# sources: data.nerf.studio). Run from the repo root; scenes land in data/.
set -e
mkdir -p data && cd data
for scene in Giannini-Hall sculpture stump aspen floating-tree dozer \
             plane kitchen person Egypt; do
  wget -nc "https://data.nerf.studio/nerfstudio/${scene}.zip"
  unzip -n "${scene}.zip"
done
cd ..
