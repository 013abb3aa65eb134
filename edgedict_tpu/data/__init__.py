from edgedict_tpu.data.audio_io import load_audio, save_wav  # noqa: F401
from edgedict_tpu.data.dataset import (  # noqa: F401
    AudioDataset, CommonVoice, Librispeech, MergedDataset, TEDLIUM,
    YoutubeCaption)
from edgedict_tpu.data.collate import (  # noqa: F401
    BucketSpec, DataLoader, seq_collate, shape_menu)
