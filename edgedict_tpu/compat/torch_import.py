"""Import reference PyTorch checkpoints into edgedict_tpu param pytrees.

A user of the reference can bring their trained `.pt` checkpoints
(cli/baseline.py:287-302 format, or lightning checkpoints) straight onto
TPU: the weight layouts were designed to map 1:1 (SURVEY.md §7 step 2 —
PyTorch gate order (i,f,g,o)/(r,z,n), separate b_ih/b_hh, LayerNorm
placement, BOS-pad convention).

Key map (reference rnnt/models.py:32-179 module tree):
  encoder.norm.{weight,bias}                  → encoder.norm.{scale,bias}
  encoder.lstm.lstms.{i}.weight_ih_l0 …       → encoder.layers[i].rnn.w_ih …
  encoder.lstm.projs.{i}.0.{weight,bias}      → encoder.layers[i].ln
  encoder.proj.{weight,bias}                  → encoder.proj.{w,b}
  decoder.embed.weight                        → decoder.embed.table
  decoder.lstm.weight_ih_l{k} …               → decoder.lstm.layers[k] …
  decoder.proj.{weight,bias}                  → decoder.proj.{w,b}
  joint.joint.0.weight  (J, E+D)              → COLUMN-SPLIT into
                                                joint.w_enc (J,E) / w_dec (J,D)
  joint.joint.0.bias                          → joint.b
  joint.joint.2.{weight,bias}                 → joint.out.{w,b}

The column split mirrors the TPU-side algebraic refactor of the joint (the
concat-then-Linear becomes two pre-broadcast projections — see
models/transducer.py joint docstring); the math is identical.
"""

import numpy as np

from edgedict_tpu.models.transducer import TransducerConfig


def convert_lightning2normal(checkpoint):
    """Lightning checkpoint → plain {'model': state_dict} (reference
    rnnt/models.py:368-380: strips the `model.` prefix)."""
    if 'state_dict' in checkpoint:
        sd = {}
        for k, v in checkpoint['state_dict'].items():
            sd[k.split('model.', 1)[1] if k.startswith('model.') else k] = v
        return {'model': sd}
    if 'model' not in checkpoint:
        return {'model': checkpoint}
    return checkpoint


def _np(t):
    try:
        return np.asarray(t.detach().cpu().numpy(), np.float32)
    except AttributeError:
        return np.asarray(t, np.float32)


def transducer_from_state_dict(state_dict, cfg: TransducerConfig):
    """Reference Transducer state_dict → edgedict_tpu params pytree."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    enc_layers = []
    for i in range(cfg.enc_layers):
        p = f'encoder.lstm.lstms.{i}.'
        enc_layers.append({
            'rnn': {
                'w_ih': sd[p + 'weight_ih_l0'],
                'w_hh': sd[p + 'weight_hh_l0'],
                'b_ih': sd[p + 'bias_ih_l0'],
                'b_hh': sd[p + 'bias_hh_l0'],
            },
            'ln': {
                'scale': sd[f'encoder.lstm.projs.{i}.0.weight'],
                'bias': sd[f'encoder.lstm.projs.{i}.0.bias'],
            },
        })
    encoder = {
        'norm': {'scale': sd['encoder.norm.weight'],
                 'bias': sd['encoder.norm.bias']},
        'layers': enc_layers,
        'proj': {'w': sd['encoder.proj.weight'],
                 'b': sd['encoder.proj.bias']},
    }

    dec_lstm = []
    for k in range(cfg.dec_layers):
        dec_lstm.append({
            'w_ih': sd[f'decoder.lstm.weight_ih_l{k}'],
            'w_hh': sd[f'decoder.lstm.weight_hh_l{k}'],
            'b_ih': sd[f'decoder.lstm.bias_ih_l{k}'],
            'b_hh': sd[f'decoder.lstm.bias_hh_l{k}'],
        })
    decoder = {
        'embed': {'table': sd['decoder.embed.weight']},
        'lstm': {'layers': dec_lstm},
        'proj': {'w': sd['decoder.proj.weight'],
                 'b': sd['decoder.proj.bias']},
    }

    w0 = sd['joint.joint.0.weight']          # (J, E + D)
    e = cfg.enc_proj_size
    joint = {
        'w_enc': w0[:, :e],
        'w_dec': w0[:, e:],
        'b': sd['joint.joint.0.bias'],
        'out': {'w': sd['joint.joint.2.weight'],
                'b': sd['joint.joint.2.bias']},
    }
    return {'encoder': encoder, 'decoder': decoder, 'joint': joint}


def load_reference_checkpoint(path, cfg: TransducerConfig):
    """torch.load a reference .pt (plain or lightning) → params pytree."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = convert_lightning2normal(ckpt)['model']
    return transducer_from_state_dict(sd, cfg)
