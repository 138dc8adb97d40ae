from svtpu.models.rbvae import Seq2SeqBinaryVAE, RBVAEOutput
