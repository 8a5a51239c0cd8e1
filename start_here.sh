#!/bin/bash
# Quickstart: edit the variables, run. (Reference start_here.sh parity —
# same variables-at-top UX, run-dir naming, and completion notify; TPU
# framework, so the CUDA_VISIBLE_DEVICES block becomes trainer.devices.)

set -e

# ==================================================================
# region variables
# ------------------------------------------------------------------

models=(
  # "EDSR"
  "SRCNN"
)

# training params
check_val_every_n_epoch=5
enable_training=1
epochs=20
devices=1                      # TPU chips (data-parallel mesh)
log_loss_every_n_epochs=2
losses="l1 + l2"
# metrics="BRISQUE FLIP LPIPS MS-SSIM PSNR SSIM"
metrics_for_pbar="PSNR"
metrics_for_save="Set14/PSNR"
optimizer="ADAM"

# known names (DIV2K, Set5, ...) resolve to HuggingFace datasets when the
# hub is reachable; else put images at $datasets_dir/DATASET_NAME/HR/
eval_datasets="Set5 Set14"
train_dataset="DIV2K"

# model params
patch_size=128
scale=4

# enable prediction (flat image dirs: datasets/NAME/*.png)
# enable_predict=1
# predict_datasets="DATASET_1_NAME DATASET_2_NAME"

# completion notification: any command, e.g. telegram-send
# export SRTPU_NOTIFY_CMD="telegram-send"

# endregion

# ==================================================================
# region configuring and running
# ------------------------------------------------------------------

losses_to_str="${losses//[ ]/}"

save_dir="X$scale"
save_dir+="_e_"$(printf "%04d" "$epochs")
save_dir+="_p_"$(printf "%03d" "$patch_size")
save_dir+="_${losses_to_str//[*+]/_}"
save_dir+="_$optimizer"
save_dir+="_${train_dataset//[ ]/_}"

SECONDS=0

for model in "${models[@]}"; do
  previous_time=$SECONDS
  run_dir="experiments/${model}_$save_dir"

  if [ -n "$enable_training" ] ; then
    python -m srtpu fit \
      --config configs/train_default_sr.yml \
      model.class_path="$model" \
      "model.init_args.losses=$losses" \
      "model.init_args.metrics_for_pbar=[${metrics_for_pbar//[ ]/, }]" \
      model.init_args.optimizer="$optimizer" \
      model.init_args.log_loss_every_n_epochs="$log_loss_every_n_epochs" \
      "data.eval_datasets=[${eval_datasets//[ ]/, }]" \
      data.patch_size="$patch_size" \
      data.scale_factor="$scale" \
      "data.train_datasets=[$train_dataset]" \
      trainer.devices="$devices" \
      trainer.check_val_every_n_epoch="$check_val_every_n_epoch" \
      trainer.default_root_dir="$run_dir" \
      trainer.monitor="$metrics_for_save" \
      trainer.max_epochs="$epochs"

    echo "${model}_$save_dir done in $(( SECONDS - previous_time ))s"
  fi

  if [ -n "$enable_predict" ] ; then
    python -m srtpu predict \
      --checkpoint "$run_dir/checkpoints" \
      "data.predict_datasets=[${predict_datasets//[ ]/, }]" \
      trainer.default_root_dir="$run_dir"
  fi
done
