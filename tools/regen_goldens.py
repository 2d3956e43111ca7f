"""Regenerate the reference-parity golden files under tests/goldens/.

Run ONCE against the mounted reference (requires /root/reference + torch):

    python tools/regen_goldens.py

Goldens are committed as data so the test suite never imports the reference.
They pin: (a) the retention module's three compute modes, (b) end-to-end
eval-mode outputs of random-initialized FS and LS reference models together
with their state dicts (which also exercises the checkpoint converter).
"""

import sys

import numpy as np
import torch


def retention_goldens():
    sys.path.insert(0, "/root/reference/LS-EEND/nnet/modules")
    from retention import MultiScaleRetention, RetNetRelPos

    torch.manual_seed(0)
    D, H, L, T = 32, 4, 5, 20
    rp = RetNetRelPos(embed_dim=D, num_heads=H, recurrent_chunk_size=L)
    ms = MultiScaleRetention(D, H, value_factor=1).eval()
    x = torch.rand(2, T, D)
    with torch.no_grad():
        yp = ms(x, rel_pos=rp(T))
        yc = ms(x, rel_pos=rp(T, chunkwise_recurrent=True), chunkwise_recurrent=True)
    w = {}
    for name in ["q_proj", "k_proj", "v_proj", "g_proj", "out_proj"]:
        m = getattr(ms, name)
        w[name + "_w"] = m.weight.detach().numpy()
        w[name + "_b"] = m.bias.detach().numpy()
    np.savez("tests/goldens/retention_ref.npz", x=x.numpy(),
             y_parallel=yp.numpy(), y_chunkwise=yc.numpy(), D=D, H=H, L=L, **w)
    sys.path.pop(0)


def model_goldens():
    torch.manual_seed(42)
    sys.path.insert(0, "/root/reference/FS-EEND")
    from nnet.model.onl_tfm_enc_1dcnn_enc_linear_non_autoreg_pos_enc_l2norm import (
        OnlineTransformerDADiarization as FS)

    # NOTE conv_delay=9: the reference hardcodes padding=9 in its cnn, so
    # only conv_delay=9 is self-consistent (onl_tfm...py:30)
    fs = FS(n_speakers=4, in_size=23, n_units=32, n_heads=4, enc_n_layers=2,
            dec_n_layers=2, dropout=0.1, has_mask=True, max_seqlen=16,
            dec_dim_feedforward=64, conv_delay=9).eval()
    with torch.no_grad():
        fs.enc.bn.running_mean.uniform_(-0.5, 0.5)
        fs.enc.bn.running_var.uniform_(0.5, 1.5)
    x = torch.randn(2, 16, 23)
    with torch.no_grad():
        out, emb, _ = fs.test([x[0], x[1]], [16, 16], max_nspks=4)
    sd = {k: v.numpy() for k, v in fs.state_dict().items()}
    np.savez("tests/goldens/fs_model_ref.npz", x=x.numpy(),
             logits=torch.stack(out).numpy(), emb=torch.stack(emb).numpy(),
             **{"sd__" + k: v for k, v in sd.items()})

    sys.path.insert(0, "/root/reference/LS-EEND")
    for mod in list(sys.modules):
        if mod.startswith("nnet"):
            del sys.modules[mod]
    sys.path.remove("/root/reference/FS-EEND")
    from nnet.model.onl_conformer_retention_enc_1dcnn_tfm_retention_enc_linear_non_autoreg_pos_enc_l2norm_emb_loss_mask import (
        OnlineConformerRetentionDADiarization as LS)

    ls = LS(n_speakers=4, in_size=23, n_units=32, n_heads=4, enc_n_layers=2,
            dec_n_layers=2, dropout=0.1, max_seqlen=16, recurrent_chunk_size=8,
            feed_forward_expansion_factor=2, dec_dim_feedforward=64,
            conv_kernel_size=5, conv_delay=3).eval()
    with torch.no_grad():
        for blk in ls.enc.encoder.layers:
            bn = blk.sequential[2].module.sequential[5]
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
    x2 = torch.randn(2, 16, 23)
    with torch.no_grad():
        out2, emb2, _ = ls.test([x2[0], x2[1]], [16, 16], max_nspks=4)
    sd2 = {k: v.numpy() for k, v in ls.state_dict().items()}
    np.savez("tests/goldens/ls_model_ref.npz", x=x2.numpy(),
             logits=torch.stack(out2).numpy(), emb=torch.stack(emb2).numpy(),
             **{"sd__" + k: v for k, v in sd2.items()})


if __name__ == "__main__":
    retention_goldens()
    model_goldens()
    print("goldens regenerated under tests/goldens/")
