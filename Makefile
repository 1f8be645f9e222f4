# Build/packaging targets — counterpart of the reference Makefile's
# engine-assembly / adapter / image-build pipeline, minus the separate
# adapter binary (the engine serves gRPC in-process; see PROTOCOL.md §6).

ENGINE_VERSION ?= $(shell grep -oE 'version := "[^"]+' build.sbt | cut -d'"' -f2)
IMAGE_REPO ?= ghcr.io/example
IMAGE := $(IMAGE_REPO)/engine-spark:$(ENGINE_VERSION)

.PHONY: engine-assembly
engine-assembly:
	sbt package
	mkdir -p image/tmp
	cp target/scala-2.13/*_2.13-$(ENGINE_VERSION).jar image/tmp/engine.spark.jar

.PHONY: image-build
image-build: engine-assembly
	docker build \
		--build-arg BASE_IMAGE=apache/spark:4.1.2-scala2.13-java17-ubuntu \
		-t $(IMAGE) \
		-f image/Dockerfile \
		.

.PHONY: test
test:
	sbt test

# Runs image/docker-entrypoint.sh (the container's exact launch path)
# against the assembled jar without docker: waits for 2884/2885, serves one
# raw query over gRPC and one over framed YAML.
.PHONY: image-smoke
image-smoke: engine-assembly
	sbt "Test/runMain graft.ImageSmoke"

.PHONY: clean
clean:
	rm -rf image/tmp
	sbt clean
