"""``torchvision.datasets`` shim: a faithful ImageFolder so the reference's
zero-shot script (cn_clip/eval/zeroshot_evaluation.py via eval/data.py's
get_zeroshot_dataset) runs unmodified in this container.

Reproduces torchvision's DatasetFolder semantics exactly for the pieces the
reference touches: sorted class dirs -> class_to_idx, recursively walked and
sorted file lists filtered by IMG_EXTENSIONS, default_loader = PIL open +
convert("RGB"), (transform(sample), class_index) items usable under a plain
torch DataLoader."""

import os

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif",
                  ".tiff", ".webp")


def default_loader(path):
    from PIL import Image

    with open(path, "rb") as f:
        img = Image.open(f)
        return img.convert("RGB")


class ImageFolder:
    def __init__(self, root, transform=None, target_transform=None,
                 loader=default_loader):
        classes = sorted(e.name for e in os.scandir(root) if e.is_dir())
        if not classes:
            raise FileNotFoundError(
                f"Couldn't find any class folder in {root}.")
        self.root = root
        self.classes = classes
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.transform = transform
        self.target_transform = target_transform
        self.loader = loader
        self.samples = []
        for cls in classes:
            cdir = os.path.join(root, cls)
            for sub, _, fnames in sorted(os.walk(cdir, followlinks=True)):
                for fname in sorted(fnames):
                    if fname.lower().endswith(IMG_EXTENSIONS):
                        self.samples.append(
                            (os.path.join(sub, fname), self.class_to_idx[cls]))
        self.imgs = self.samples
        self.targets = [t for _, t in self.samples]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        path, target = self.samples[index]
        sample = self.loader(path)
        if self.transform is not None:
            sample = self.transform(sample)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return sample, target
