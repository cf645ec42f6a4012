#!/bin/bash
# Train the four cascaded denoisers (parity with reference train_ldm.sh).
# DeepCAD: max_face 30, max_edge 20.
python ldm.py --data data_process/deepcad_parsed \
    --list data_process/deepcad_data_split_6bit.pkl \
    --option surfpos --batch_size 256 --train_nepoch 3000 --bf16 \
    --max_face 30 --max_edge 20 --env deepcad_ldm_surfpos

python ldm.py --data data_process/deepcad_parsed \
    --list data_process/deepcad_data_split_6bit.pkl \
    --surfvae proj_log/deepcad_vae_surf/epoch_400 \
    --option surfz --batch_size 256 --train_nepoch 3000 --bf16 \
    --max_face 30 --max_edge 20 --env deepcad_ldm_surfz

python ldm.py --data data_process/deepcad_parsed \
    --list data_process/deepcad_data_split_6bit.pkl \
    --surfvae proj_log/deepcad_vae_surf/epoch_400 \
    --option edgepos --batch_size 128 --train_nepoch 1000 --bf16 \
    --max_face 30 --max_edge 20 --env deepcad_ldm_edgepos

python ldm.py --data data_process/deepcad_parsed \
    --list data_process/deepcad_data_split_6bit.pkl \
    --surfvae proj_log/deepcad_vae_surf/epoch_400 \
    --edgevae proj_log/deepcad_vae_edge/epoch_400 \
    --option edgez --batch_size 128 --train_nepoch 1000 --bf16 \
    --max_face 30 --max_edge 20 --env deepcad_ldm_edgez

# ABC: max_face 50, max_edge 30 (see reference train_ldm.sh:36-57); pass
# --data/--list for abc_parsed and adjust epochs (1000/1000/300/300).
