from .temporal import c2f_num_embeddings, init_temporal_grid, temporal_embed
from .rigid import (
    remove_instances,
    replace_instance,
    EmdHeads,
    RigidAux,
    RigidConfig,
    RigidParams,
    create_rigid,
    emd_offsets,
    instance_pose_at,
    out_of_bound_mask,
    rigid_world_gaussians,
    temporal_smoothness_reg,
)
from .deformable import (
    DeformableConfig,
    DeformableParams,
    create_deformable,
    deformable_world_gaussians,
    out_of_bound_loss,
)
from .mlp import (
    ConditionalDeformNetwork,
    DeformNetwork,
    Linear,
    SkipMLP,
    conditional_deform_init,
    deform_network_init,
    linear_init,
    posenc,
    posenc_dim,
    skip_mlp_init,
)
from .hexplane import (
    HexPlane,
    hexplane_features,
    init_hexplane,
    plane_tv_loss,
    set_aabb,
    time_l1_loss,
    time_smoothness_loss,
)
from .s3field import (
    Deformed,
    S3FieldConfig,
    S3FieldParams,
    apply_s3_field,
    create_s3_field,
)
from .embedding_reg import embedding_knn_loss, knn_graph, scale_percentile_reg
from .smpl import (
    N_JOINTS,
    SMPL_PARENTS,
    SmplAux,
    SmplConfig,
    SmplParams,
    SmplTemplate,
    batch_rigid_transform,
    create_smpl,
    joint_smoothness_reg,
    load_smpl_model,
    load_smpl_template,
    on_mesh_init,
    procedural_template,
    shaped_vertices,
    smpl_world_gaussians,
)
from .pvg import (
    PvgConfig,
    PvgParams,
    create_pvg,
    pvg_at_time,
    pvg_staticness,
    velocity_reg,
)
from .deformgs import (
    DeformGsParams,
    create_deformgs,
    deformgs_at_time,
    merf_contract,
)
from .hash_encoding import HashEncoding, create_hash_encoding, hash_encode
from .voxel_deformer import (
    VoxelDeformer,
    corrected_weights,
    voxel_magnitude_loss,
    voxel_tv_loss,
)
from .smpl import knn_consistency_reg, x_offset_reg
