#!/usr/bin/env bash
# TPU VM training launcher — the rebuild's equivalent of the reference's
# Slurm job (reference: run1.job — csh, 1 GPU, venv activate, then
# `python train.py train_config4.json`).
#
# Usage:  ./jobs/train_tpu.sh <train_config.json> [extra CLI args...]
# Env:    POSE_TPU_JAX_CACHE   persistent XLA compile cache dir
#         JAX_PLATFORMS        override platform (e.g. cpu for dry runs)
set -euo pipefail

CONFIG="${1:?usage: train_tpu.sh <train_config.json>}"
shift || true

REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export POSE_TPU_JAX_CACHE="${POSE_TPU_JAX_CACHE:-${HOME}/.cache/pose_tpu_jax}"

exec python -m pose_estimation_amitai_tpu train "${CONFIG}" "$@"
