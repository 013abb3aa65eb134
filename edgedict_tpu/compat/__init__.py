from edgedict_tpu.compat.torch_import import (  # noqa: F401
    convert_lightning2normal, load_reference_checkpoint,
    transducer_from_state_dict)
