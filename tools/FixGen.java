import java.awt.image.BufferedImage;
import java.io.*;
import java.util.Iterator;
import javax.imageio.*;
import javax.imageio.stream.*;
import javax.imageio.metadata.*;

/**
 * Real-encoder fixture generator: javax.imageio (JDK's own codec suite,
 * independent of this repo's pure-Python decoders) encodes deterministic
 * and photographic images as CCITT-G4 TIFF, LZW TIFF, GIF, and
 * baseline/progressive JPEG. Also dumps ImageIO's DECODED rasters so the
 * Python tests can anchor against a genuine third-party decode.
 */
public class FixGen {
    static void writeWith(BufferedImage img, String format, String compression,
                          boolean progressive, File out) throws Exception {
        writeWith(img, format, compression, progressive, 0, 0, out);
    }

    static void writeWith(BufferedImage img, String format, String compression,
                          boolean progressive, int tileW, int tileH, File out) throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName(format);
        ImageWriter w = it.next();
        ImageWriteParam p = w.getDefaultWriteParam();
        if (compression != null) {
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionType(compression);
        }
        if (tileW > 0) {
            p.setTilingMode(ImageWriteParam.MODE_EXPLICIT);
            p.setTiling(tileW, tileH, 0, 0);
        }
        if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
        try (ImageOutputStream ios = ImageIO.createImageOutputStream(out)) {
            w.setOutput(ios);
            w.write(null, new IIOImage(img, null, null), p);
        }
        w.dispose();
    }

    static void dumpSamples(BufferedImage img, File out) throws Exception {
        // RAW raster samples (no colorspace conversion -- getRGB would
        // gamma-encode gray samples)
        java.awt.image.Raster r = img.getRaster();
        int h = img.getHeight(), w = img.getWidth(), b = r.getNumBands();
        try (DataOutputStream os = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(out)))) {
            os.writeInt(h); os.writeInt(w); os.writeInt(b);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    for (int k = 0; k < b; k++)
                        os.writeByte(r.getSample(x, y, k));
        }
    }

    static void dumpRaster(BufferedImage img, File out) throws Exception {
        int h = img.getHeight(), w = img.getWidth();
        try (DataOutputStream os = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(out)))) {
            os.writeInt(h); os.writeInt(w);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int rgb = img.getRGB(x, y);
                    os.writeByte((rgb >> 16) & 0xFF);
                    os.writeByte((rgb >> 8) & 0xFF);
                    os.writeByte(rgb & 0xFF);
                }
        }
    }

    public static void main(String[] args) throws Exception {
        File dir = new File(args[0]);
        dir.mkdirs();

        // 1) deterministic bitonal pattern -> CCITT T.6 (G4) TIFF
        int bw = 71, bh = 29;  // odd sizes exercise row-edge paths
        BufferedImage bin = new BufferedImage(bw, bh, BufferedImage.TYPE_BYTE_BINARY);
        for (int y = 0; y < bh; y++)
            for (int x = 0; x < bw; x++) {
                boolean ink = ((x * 7 + y * 13) % 11 < 4) || (y == 5) || (x > 60 && y % 2 == 0);
                bin.setRGB(x, y, ink ? 0x000000 : 0xFFFFFF);
            }
        writeWith(bin, "tiff", "CCITT T.6", false, new File(dir, "real_g4.tif"));
        writeWith(bin, "tiff", "CCITT T.4", false, new File(dir, "real_g3.tif"));
        writeWith(bin, "tiff", "CCITT RLE", false, new File(dir, "real_mh.tif"));
        writeWith(bin, "tiff", "CCITT T.6", false, 32, 16, new File(dir, "real_g4_tiled.tif"));
        dumpSamples(bin, new File(dir, "bitonal.raster"));

        // 2) deterministic gray gradient -> LZW TIFF
        int gw = 37, gh = 23;
        BufferedImage gray = new BufferedImage(gw, gh, BufferedImage.TYPE_BYTE_GRAY);
        for (int y = 0; y < gh; y++)
            for (int x = 0; x < gw; x++)
                gray.getRaster().setSample(x, y, 0, (x * 31 + y * 97) % 256);
        writeWith(gray, "tiff", "LZW", false, new File(dir, "real_lzw.tif"));
        dumpSamples(gray, new File(dir, "gray.raster"));

        // 3) photographic content: downscale a real kitten photo, re-encode
        BufferedImage kitten = ImageIO.read(new File(
            "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/DP802813.jpg"));
        int kw = 64, kh = 48;
        BufferedImage small = new BufferedImage(kw, kh, BufferedImage.TYPE_INT_RGB);
        java.awt.Graphics2D g = small.createGraphics();
        g.drawImage(kitten.getScaledInstance(kw, kh, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null);
        g.dispose();
        writeWith(small, "jpeg", null, false, new File(dir, "real_baseline.jpg"));
        writeWith(small, "jpeg", null, true, new File(dir, "real_progressive.jpg"));
        writeWith(small, "gif", null, false, new File(dir, "real_imageio.gif"));
        // dump ImageIO's DECODE of the two jpegs (third-party decode anchor)
        dumpRaster(ImageIO.read(new File(dir, "real_baseline.jpg")), new File(dir, "baseline.raster"));
        dumpRaster(ImageIO.read(new File(dir, "real_progressive.jpg")), new File(dir, "progressive.raster"));
        dumpRaster(ImageIO.read(new File(dir, "real_imageio.gif")), new File(dir, "imageio_gif.raster"));

        // 3b) same photo through ImageIO's BMP writer (24-bit, bottom-up)
        writeWith(small, "bmp", null, false, new File(dir, "real_imageio.bmp"));
        dumpRaster(ImageIO.read(new File(dir, "real_imageio.bmp")), new File(dir, "imageio_bmp.raster"));

        // 4) third-party decode of a real-world giflib-era GIF (tcl/tk ships it)
        BufferedImage tk = ImageIO.read(new File("/usr/share/tcltk/tk8.6/images/logo64.gif"));
        dumpRaster(tk, new File(dir, "tk_logo64.raster"));

        System.out.println("fixtures written to " + dir);
    }
}
