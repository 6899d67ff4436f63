// Real-encoder anchor generator for SUB-BYTE TIFF variants (1/2/4-bit
// grayscale and palette-color), javax.imageio (JDK 17) -- same conformance
// role as FixGen.java but a separate tool so running it can never touch
// the frozen fixtures FixGen produced. Writes:
//   real_gray1.tif    TYPE_BYTE_BINARY bilevel, uncompressed (BitsPerSample 1)
//   real_pal4.tif     16-color IndexColorModel, uncompressed (4-bit palette)
//   real_pal4_lzw.tif same image, LZW
//   real_pal2.tif     4-color IndexColorModel (2-bit palette)
//   *.raster          ImageIO's own decoded RGB dump (>i4 h, w then RGB triples)
// Usage: javac tools/TiffSubByteGen.java && java TiffSubByteGen tests/fixtures/real_anchors
import java.io.*;
import java.util.Iterator;
import javax.imageio.*;
import javax.imageio.stream.ImageOutputStream;
import java.awt.image.*;

public class TiffSubByteGen {
    static void writeWith(BufferedImage img, String compression, File out) throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("tiff");
        ImageWriter w = it.next();
        ImageWriteParam p = w.getDefaultWriteParam();
        if (compression == null) {
            p.setCompressionMode(ImageWriteParam.MODE_DISABLED);
        } else {
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionType(compression);
        }
        try (ImageOutputStream ios = ImageIO.createImageOutputStream(out)) {
            w.setOutput(ios);
            w.write(null, new IIOImage(img, null, null), p);
        }
        w.dispose();
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
        int W = 37, H = 23;  // deliberately non-multiple-of-8 width

        // bilevel: deterministic interference pattern
        BufferedImage bin = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_BINARY);
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++)
                bin.getRaster().setSample(x, y, 0, ((x * 7 + y * 13) % 11 < 4) ? 1 : 0);
        writeWith(bin, null, new File(dir, "real_gray1.tif"));
        dumpRaster(ImageIO.read(new File(dir, "real_gray1.tif")), new File(dir, "gray1.raster"));

        // 16-color palette (4-bit)
        byte[] r = new byte[16], g = new byte[16], b = new byte[16];
        for (int i = 0; i < 16; i++) {
            r[i] = (byte) (i * 17); g[i] = (byte) (255 - i * 17); b[i] = (byte) ((i * 53) & 0xFF);
        }
        IndexColorModel cm16 = new IndexColorModel(4, 16, r, g, b);
        BufferedImage pal4 = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_BINARY, cm16);
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++)
                pal4.getRaster().setSample(x, y, 0, (x * 3 + y * 5) % 16);
        writeWith(pal4, null, new File(dir, "real_pal4.tif"));
        writeWith(pal4, "LZW", new File(dir, "real_pal4_lzw.tif"));
        dumpRaster(ImageIO.read(new File(dir, "real_pal4.tif")), new File(dir, "pal4.raster"));

        // 4-color palette (2-bit)
        byte[] r2 = {0, (byte) 255, 0, (byte) 128};
        byte[] g2 = {0, 0, (byte) 255, (byte) 128};
        byte[] b2 = {(byte) 255, 0, 0, (byte) 64};
        IndexColorModel cm4 = new IndexColorModel(2, 4, r2, g2, b2);
        BufferedImage pal2 = new BufferedImage(W, H, BufferedImage.TYPE_BYTE_BINARY, cm4);
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++)
                pal2.getRaster().setSample(x, y, 0, (x + y) % 4);
        writeWith(pal2, null, new File(dir, "real_pal2.tif"));
        dumpRaster(ImageIO.read(new File(dir, "real_pal2.tif")), new File(dir, "pal2.raster"));

        System.out.println("wrote sub-byte TIFF anchors to " + dir);
    }
}
