from tvqaplus_tpu.interop.torch_weights import (
    flax_to_torch_state_dict,
    torch_state_dict_to_flax,
    load_reference_checkpoint,
)
