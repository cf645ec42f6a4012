#!/bin/bash
# Train the surface & edge VAEs (parity with reference train_vae.sh).
# DeepCAD
python vae.py --data data_process/deepcad_parsed \
    --train_list data_process/deepcad_data_split_6bit_surface.pkl \
    --val_list data_process/deepcad_data_split_6bit.pkl \
    --option surface --batch_size 512 --train_nepoch 400 --bf16 \
    --env deepcad_vae_surf

python vae.py --data data_process/deepcad_parsed \
    --train_list data_process/deepcad_data_split_6bit_edge.pkl \
    --val_list data_process/deepcad_data_split_6bit.pkl \
    --option edge --batch_size 512 --train_nepoch 400 --bf16 \
    --env deepcad_vae_edge

# ABC
python vae.py --data data_process/abc_parsed \
    --train_list data_process/abc_data_split_6bit_surface.pkl \
    --val_list data_process/abc_data_split_6bit.pkl \
    --option surface --batch_size 512 --train_nepoch 200 --bf16 \
    --env abc_vae_surf

python vae.py --data data_process/abc_parsed \
    --train_list data_process/abc_data_split_6bit_edge.pkl \
    --val_list data_process/abc_data_split_6bit.pkl \
    --option edge --batch_size 512 --train_nepoch 200 --bf16 \
    --env abc_vae_edge
