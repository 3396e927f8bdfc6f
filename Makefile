# Convenience shim: the native gather engine's sources live inside the
# package (ugaitnet_tpu/native/) so installed copies can self-build; this
# keeps the repo-root `make native` workflow working.
native:
	$(MAKE) -C ugaitnet_tpu/native

clean:
	$(MAKE) -C ugaitnet_tpu/native clean

.PHONY: native clean
