#!/usr/bin/env bash
# Install DELiVR-TPU directly on a Cloud TPU VM (the non-container path;
# reference analog: misc_files/install_script_Linux.sh). Run from the repo
# root on a v5e/v4 VM image that already ships the TPU runtime.
set -euo pipefail

python3 -m venv "${VENV_DIR:-$HOME/.delivr-tpu}"
# shellcheck disable=SC1091
source "${VENV_DIR:-$HOME/.delivr-tpu}/bin/activate"

pip install --upgrade pip
pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install numpy scipy pandas optax
pip install .

# build the native library (C++ connected components + TIFF codecs; g++ required)
python -c "from delivr_cfos_tpu.native.build import get_library; print(get_library())"

echo "DELiVR-TPU installed. Run: python -m delivr_cfos_tpu /path/to/config.json"
