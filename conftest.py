# Root conftest: ensures the repository root is on sys.path so that
# `import one_to_many_gan_tpu` works without installation.
