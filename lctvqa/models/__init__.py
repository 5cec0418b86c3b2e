"""Model zoo: VGG19, question encoder/decoder, W and EF VQA models,
PC-DARTS search network, genotypes, unified QA model."""
