#!/usr/bin/env bash
# Download the VGGSound spectrogram features (~90 GB, sharded tars) from the
# public SpecVQGAN bucket, verify md5, and untar.
# Capability parity with /root/reference/data/download_vggsound_features.sh.
set -euo pipefail

cd "$(dirname "$0")"

BASE="https://a3s.fi/swift/v1/AUTH_a235c0f452d648828f745589cde1219a/specvqgan_public"
MD5_FILE="vggsound.md5"

PARTS=(vggsound_mel_a vggsound_mel_b vggsound_mel_c vggsound_mel_d \
       vggsound_mel_e vggsound_mel_f vggsound_mel_g vggsound_mel_h)

for p in "${PARTS[@]}"; do
  if [ ! -f "$p.tar" ]; then
    echo "Downloading $p.tar ..."
    curl -L -O "$BASE/$p.tar"
  fi
done

if [ -f "$MD5_FILE" ]; then
  echo "Verifying md5 ..."
  md5sum -c "$MD5_FILE"
else
  echo "No $MD5_FILE manifest found; skipping verification."
fi

mkdir -p vggsound/melspec_10s_22050hz
for p in "${PARTS[@]}"; do
  echo "Extracting $p.tar ..."
  tar -xf "$p.tar" -C vggsound/melspec_10s_22050hz
done
echo "Done. Features in ./vggsound/melspec_10s_22050hz"
